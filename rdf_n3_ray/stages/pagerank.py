"""Distributed PageRank in exact integer arithmetic.

Same execution shape as `components.py` (which see, for why an
iterative algorithm uses driver-orchestrated raw Ray tasks over stable
hash buckets instead of a Dataset groupby per round): per-bucket state
lives in the object store as sorted int64 arrays, each round is B
contribution tasks + B fold tasks wired ref-to-ref, and the driver
never sees per-node data until the final projection.

All arithmetic is scaled int64 with floor division —
  teleport = (scale * (damp_den - damp_num)) // damp_den
  contrib(u->v) = (rank[u] * damp_num) // (damp_den * outdeg[u])
  rank'[v] = teleport + sum(contribs into v)
— so the result is a pure deterministic function of the edge set
(integer sums are associative; no float summation order to diverge),
and a SQL engine reproduces it bit-for-bit (see
`relational._pagerank_sql`).  This is the standard simplified PageRank
without dangling-mass redistribution: ranks are defined over edge
SOURCES, and a contribution whose target never appears as a source is
dropped.  On a symmetrized graph (every edge added in both directions,
as `trade_pagerank` builds it) every endpoint is a source, so nothing
is dropped.

Mass/overflow bound: total in-flight mass <= n_nodes * scale, and the
per-edge product rank * damp_num stays under 2^63 for any corpus with
n_nodes * scale * damp_num < 9.2e18 — at the default scale 1e9 that is
~10^8 nodes; lower `scale` for bigger graphs.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .components import _ret, _split_by


@ray.remote
def _pr_bucketize(tbl: "pa.Table", num_buckets: int):
    """One (src, dst) edge block -> per-src-bucket shards."""
    if "src" not in tbl.schema.names:  # all-empty block drops columns
        z = np.empty(0, np.int64)
        return _ret([(z, z)] * num_buckets, num_buckets)
    s = tbl.column("src").to_numpy().astype(np.int64, copy=False)
    d = tbl.column("dst").to_numpy().astype(np.int64, copy=False)
    return _ret(_split_by(s % num_buckets, num_buckets, s, d), num_buckets)


@ray.remote(num_returns=2)
def _pr_init(scale: int, num_buckets: int, *shards):
    """Concat this bucket's edge shards and precompute everything
    round-invariant ONCE: the per-edge source index into the owned
    node list, and the destination-bucket permutation + cut bounds —
    so each round's contribution task is a pure gather (no argsort or
    searchsorted repeated per iteration)."""
    s = np.concatenate([x[0] for x in shards]) if shards else \
        np.empty(0, np.int64)
    d = np.concatenate([x[1] for x in shards]) if shards else \
        np.empty(0, np.int64)
    nodes, outdeg = np.unique(s, return_counts=True)
    idx = np.searchsorted(nodes, s)  # every src is an owned node
    part = d % num_buckets
    perm = np.argsort(part, kind="stable")
    dsorted = d[perm]
    bounds = np.searchsorted(part[perm], np.arange(num_buckets + 1))
    ranks = np.full(len(nodes), scale, dtype=np.int64)
    return (idx, perm, dsorted, bounds), \
        (nodes, outdeg.astype(np.int64), ranks)


@ray.remote
def _pr_contrib(edges, state, num_buckets: int,
                damp_num: int, damp_den: int):
    """Per owned edge: floor-divided damped contribution, keyed by the
    destination's bucket — one multiply/divide and two gathers per
    round, everything positional precomputed in _pr_init."""
    idx, perm, dsorted, bounds = edges
    nodes, outdeg, rank = state
    c = (rank[idx] * damp_num) // (damp_den * outdeg[idx])
    cs = c[perm]
    return _ret([(dsorted[a:b], cs[a:b])
                 for a, b in zip(bounds[:-1], bounds[1:])], num_buckets)


@ray.remote
def _pr_fold(state, teleport: int, *shards):
    nodes, outdeg, _ = state
    new = np.full(len(nodes), teleport, dtype=np.int64)
    d = np.concatenate([x[0] for x in shards]) if shards else \
        np.empty(0, np.int64)
    if len(d):
        c = np.concatenate([x[1] for x in shards])
        # drop contributions to nodes this bucket does not own (only
        # possible on non-symmetrized inputs; see module docstring)
        pos = np.searchsorted(nodes, d)
        ok = (pos < len(nodes)) & (nodes[np.minimum(pos, len(nodes) - 1)]
                                   == d) if len(nodes) else \
            np.zeros(len(d), dtype=bool)
        np.add.at(new, pos[ok], c[ok])
    return (nodes, outdeg, new)


@ray.remote
def _pr_project(state) -> "pa.Table":
    nodes, _, rank = state
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "pr": pa.array(rank, pa.int64())})


def pagerank(edges_ds, iters: int = 5, num_buckets: int = 8,
             scale: int = 10 ** 9, damp_num: int = 85,
             damp_den: int = 100):
    """(src, dst) edge Dataset -> (node, pr) Dataset after `iters`
    damped integer-PageRank rounds.  Nodes are the edge sources;
    callers wanting every endpoint ranked must symmetrize first."""
    import ray.data as rd

    B = num_buckets
    teleport = (scale * (damp_den - damp_num)) // damp_den
    blocks = edges_ds.select_columns(["src", "dst"]).to_arrow_refs()
    if not blocks:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "pr": pa.array([], pa.int64())}))

    def as_list(refs):
        return [refs] if B == 1 else refs

    grid = [as_list(_pr_bucketize.options(num_returns=B).remote(blk, B))
            for blk in blocks]
    edges, states = [], []
    for b in range(B):
        e, st = _pr_init.remote(scale, B, *[row[b] for row in grid])
        edges.append(e)
        states.append(st)

    for _ in range(iters):
        shards = [as_list(_pr_contrib.options(num_returns=B).remote(
            edges[b], states[b], B, damp_num, damp_den))
            for b in range(B)]
        states = [_pr_fold.remote(states[b], teleport,
                                  *[shards[src][b] for src in range(B)])
                  for b in range(B)]

    return rd.from_arrow_refs([_pr_project.remote(st) for st in states])
