"""Distributed connected components over an edge Dataset.

The driver-side union-find in `embed_dedup.dup_groups_from_pairs` is
the right tool when the verified near-dup pair list is tiny; this
stage is the 100 TB path: hash-to-min label propagation (Rastogi et
al., "Finding Connected Components in Map-Reduce in Logarithmic
Rounds", ICDE 2013 — the neighborhood-min variant) plus pointer
halving, so rounds = O(log n) instead of component diameter.

Why raw Ray tasks and not Dataset groupby rounds: an iterative
algorithm re-partitions the SAME keyed state every round.  Expressing
each round as `union().groupby(bucket).map_groups(...)` re-sorts and
re-shuffles the whole label+edge corpus from scratch 3x per round
(measured: 193 s for a graph the task version finishes in <2 s) —
Dataset has no notion of "this data is already bucket-resident".
This is exactly the brief's case (c): per-bucket state lives in the
object store as plain int64 arrays, every round is B propagate + B
fold + B answer + B apply tasks wired ref-to-ref, and the driver sees
only one `changed` counter per bucket per round.

Scale shape:
- state is NARROW: per bucket, edges as two sorted int64 arrays
  (k = owning endpoint, v = far endpoint) built ONCE, labels as two
  int64 arrays (nodes sorted, label) — 16 bytes/edge, 16 bytes/node;
- each round moves only (dest, label) candidate shards and
  (target, requester) halving lookups between buckets — all int64
  pairs, partitioned by `key % num_buckets`, never an all-pairs join;
- every per-bucket kernel is a vectorized searchsorted / minimum.at
  over sorted arrays (labels are per-bucket unique and sorted, so
  joins are O(m log n) with no hash table);
- labels only ever DECREASE (min semantics, label(x) <= x invariant),
  so pointer halving can apply responses with np.minimum, and
  convergence (`sum(changed) == 0`) is a true fixed point: min over
  every closed neighborhood AND label(label(u)) == label(u).

Determinism: labels converge to min(component member id) — the same
canonical representative `dup_groups_from_pairs` emits, so either
implementation yields byte-identical groups.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _split_by(part: np.ndarray, num_buckets: int, *cols: np.ndarray):
    """Stable-sort rows by `part` and cut into num_buckets shards;
    returns a list of column-tuples, one per bucket."""
    order = np.argsort(part, kind="stable")
    p = part[order]
    sorted_cols = [c[order] for c in cols]
    bounds = np.searchsorted(p, np.arange(num_buckets + 1))
    return [tuple(c[s:e] for c in sorted_cols)
            for s, e in zip(bounds[:-1], bounds[1:])]


def _ret(shards, num_buckets: int):
    """With num_returns=1 Ray treats the returned value as THE single
    output (no destructuring), so unwrap the one-bucket case."""
    return shards[0] if num_buckets == 1 else shards


@ray.remote
def _bucketize(tbl: "pa.Table", num_buckets: int):
    """One input block -> per-bucket (k, v) edge shards, both
    directions, keyed by the endpoint that OWNS the row (k)."""
    if "a" not in tbl.schema.names:  # an all-empty block drops columns
        z = np.empty(0, np.int64)
        return _ret([(z, z)] * num_buckets, num_buckets)
    a = tbl.column("a").to_numpy().astype(np.int64, copy=False)
    b = tbl.column("b").to_numpy().astype(np.int64, copy=False)
    k = np.concatenate([a, b])
    v = np.concatenate([b, a])
    return _ret(_split_by(k % num_buckets, num_buckets, k, v), num_buckets)


@ray.remote(num_returns=2)
def _init_bucket(*shards):
    """Concat this bucket's edge shards, sort by k once (so every
    round's label lookup is a searchsorted), derive initial labels
    label(x) = x over the bucket's owned nodes."""
    k = np.concatenate([s[0] for s in shards]) if shards else \
        np.empty(0, np.int64)
    v = np.concatenate([s[1] for s in shards]) if shards else \
        np.empty(0, np.int64)
    order = np.argsort(k, kind="stable")
    k, v = k[order], v[order]
    nodes = np.unique(k)
    return (k, v), (nodes, nodes.copy())


@ray.remote
def _propagate(edges, labels, num_buckets: int):
    """Deliver each owned node's label across its outgoing edges as
    (dest, candidate_label) shards keyed by the destination's bucket."""
    k, v = edges
    nodes, vals = labels
    lab = vals[np.searchsorted(nodes, k)]  # every k is an owned node
    return _ret(_split_by(v % num_buckets, num_buckets, v, lab), num_buckets)


@ray.remote
def _fold(labels, num_buckets: int, *cand_shards):
    """Per owned node: label <- min(label, candidates).  Also emits the
    pointer-halving lookups (target = new label value, requester =
    node) keyed by the bucket that owns the target.  Every label VALUE
    is itself an edge-endpoint node id (labels start as node ids and
    only ever move to other observed ids), so each lookup finds
    exactly one owner row."""
    nodes, vals = labels
    new = vals.copy()
    dest = np.concatenate([s[0] for s in cand_shards]) if cand_shards \
        else np.empty(0, np.int64)
    if len(dest):
        cl = np.concatenate([s[1] for s in cand_shards])
        np.minimum.at(new, np.searchsorted(nodes, dest), cl)
    reqs = _split_by(new % num_buckets, num_buckets, new, nodes)
    return [(nodes, new)] + reqs


@ray.remote
def _answer(labels, num_buckets: int, *req_shards):
    """Resolve label(target) for each halving lookup against this
    bucket's post-fold labels; responses keyed by the requester's
    bucket.  Answering with the fresher (folded) labels only
    accelerates convergence — labels are monotone decreasing."""
    nodes, vals = labels
    tgt = np.concatenate([s[0] for s in req_shards]) if req_shards \
        else np.empty(0, np.int64)
    rq = np.concatenate([s[1] for s in req_shards]) if req_shards \
        else np.empty(0, np.int64)
    ll = vals[np.searchsorted(nodes, tgt)] if len(tgt) \
        else np.empty(0, np.int64)
    return _ret(_split_by(rq % num_buckets, num_buckets, rq, ll), num_buckets)


@ray.remote(num_returns=2)
def _apply(old_labels, folded_labels, *resp_shards):
    """label(u) <- min(folded, label(label(u))); emits the round's
    changed count vs the round-start labels (halving can only lower a
    label — label(x) <= x — so min is exact, not heuristic)."""
    nodes, oldv = old_labels
    _, fv = folded_labels
    final = fv.copy()
    rq = np.concatenate([s[0] for s in resp_shards]) if resp_shards \
        else np.empty(0, np.int64)
    if len(rq):
        ll = np.concatenate([s[1] for s in resp_shards])
        np.minimum.at(final, np.searchsorted(nodes, rq), ll)
    return (nodes, final), int((final != oldv).sum())


@ray.remote
def _project(labels) -> "pa.Table":
    nodes, vals = labels
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "label": pa.array(vals, pa.int64())})


def connected_components(pairs_ds, num_buckets: int = 8,
                         max_iters: int = 64):
    """(a, b) edge Dataset -> (node, label) Dataset where label is the
    minimum node id of the node's connected component.  Only edge
    endpoints appear (isolated nodes have no edges to name them)."""
    import ray.data as rd

    B = num_buckets

    def as_list(refs):  # num_returns=1 yields a bare ref, not a list
        return [refs] if B == 1 else refs

    blocks = pairs_ds.select_columns(["a", "b"]).to_arrow_refs()

    empty = pa.table({"node": pa.array([], pa.int64()),
                      "label": pa.array([], pa.int64())})

    # bucketize every block (num_returns=B shard refs each), then one
    # init task per bucket over its column of shards
    shard_grid = [as_list(_bucketize.options(num_returns=B).remote(blk, B))
                  for blk in blocks]
    if not shard_grid:
        return rd.from_arrow(empty)
    # a block with zero edges still returns B (empty) shards — no
    # driver-side filtering needed; _init_bucket concats them away
    edges, labels = [], []
    for b in range(B):
        e, l = _init_bucket.remote(*[row[b] for row in shard_grid])
        edges.append(e)
        labels.append(l)

    converged = False
    for _ in range(max_iters):
        cand = [as_list(_propagate.options(num_returns=B).remote(
            edges[b], labels[b], B)) for b in range(B)]
        folded = [_fold.options(num_returns=B + 1).remote(
            labels[b], B, *[cand[src][b] for src in range(B)])
            for b in range(B)]
        new_lab = [folded[b][0] for b in range(B)]
        resp = [as_list(_answer.options(num_returns=B).remote(
            new_lab[b], B, *[folded[src][1 + b] for src in range(B)]))
            for b in range(B)]
        applied = [_apply.remote(labels[b], new_lab[b],
                                 *[resp[src][b] for src in range(B)])
                   for b in range(B)]
        labels = [applied[b][0] for b in range(B)]
        # the only per-round driver traffic: B ints
        if sum(ray.get([applied[b][1] for b in range(B)])) == 0:
            converged = True
            break

    if not converged:
        # silent fall-through would emit labels that are not component
        # minima — downstream dedup would keep wrong documents
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            "rounds (pointer halving makes this O(log n) — raise "
            "max_iters only for genuinely astronomical graphs)")
    return rd.from_arrow_refs([_project.remote(lab) for lab in labels])
