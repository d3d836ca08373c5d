"""Reasoning as Ray Data stages.

Two scales (SURVEY.md §3.3):

1. **Per-turn reasoning** (`ReasonTurns`): each transcript turn is an
   independent small N3 document — the reasoner runs *inside*
   map_batches as an actor-pool stage.  This is the common case and is
   embarrassingly parallel (no shuffle at all).

2. **KB-scale fixed point** (`reason_dataset`): one big triple Dataset
   plus a small rule set.  Rules are tiny and broadcast; each iteration
   runs per-rule BGP matching with *distributed* per-pattern filters
   (map_batches projections to bindings tables), joins the (much
   smaller) bindings tables on the driver, instantiates consequents,
   unions + exact-dedups, and tests the count fixed point —
   mirroring `kb_i+1 = dedup(kb_i ∪ apply_rules(kb_i))`
   (reasoner.rb:123-140).  Partitioning assumption: antecedent patterns
   are selective, so bindings tables fit the driver; the KB itself never
   leaves the cluster.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import terms as T
from ..algebra.builtins import is_var
from ..algebra.engine import Engine, EvalContext, reason
from ..parser.n3_parser import parse_n3


class ReasonTurns:
    """Actor-pool stage: per-turn parse + fixed-point reasoning.

    Emits the reasoned closure's data projection per turn, plus
    conclusion counts — the distributed equivalent of the reference CLI
    `reason` command (format.rb:39-95)."""

    def __init__(self, think: bool = True, conclusions_only: bool = False):
        self.think = think
        self.conclusions_only = conclusions_only
        # distinct-text result cache (see stages/extract.py): reasoning
        # is pure in the turn text, and duplicate turns dominate
        from ..stages.lru import LruDict

        self._cache = LruDict(16384)

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        turn = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        oc, ot, os_, op, oo, inf = [], [], [], [], [], []
        for c, t, text in zip(conv, turn, texts):
            if not text:
                continue
            cached = self._cache.get(text)
            if cached is None:
                parsed = parse_n3(text, list_terms=True)
                if parsed.errors and not parsed.quads:
                    cached = ([], set())
                else:
                    result = reason(parsed.quads, think=self.think)
                    quads = (result.conclusions() if self.conclusions_only
                             else result.data())
                    cached = (quads, set(result.inferred))
                self._cache.put(text, cached)  # LRU half-eviction
            quads, inferred_set = cached
            for q in quads:
                if q[3] is not None:
                    continue
                oc.append(c)
                ot.append(t)
                os_.append(q[0])
                op.append(q[1])
                oo.append(q[2])
                inf.append(q in inferred_set)
        return pa.table(
            {
                "conv_id": pa.array(oc, pa.string()),
                "turn_idx": pa.array(ot, pa.int32()),
                "subj": pa.array(os_, pa.string()),
                "pred": pa.array(op, pa.string()),
                "obj": pa.array(oo, pa.string()),
                "inferred": pa.array(inf, pa.bool_()),
            }
        )


def reason_transcripts(transcripts_ds, think: bool = True, concurrency=None,
                       batch_size: int = 256):
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        return transcripts_ds.map_batches(
            ReasonTurns, fn_constructor_kwargs={"think": think},
            concurrency=concurrency, **kwargs,
        )
    return transcripts_ds.map_batches(ReasonTurns(think=think), **kwargs)


# ---------------------------------------------------------------------------
# KB-scale fixed point
# ---------------------------------------------------------------------------

def extract_rules(quads):
    """Pull (antecedent patterns, consequent templates) rule pairs out of
    a quad list (log:implies statements at the default graph)."""
    from collections import defaultdict

    graphs = defaultdict(list)
    for q in quads:
        graphs[q[3]].append(q)
    rules = []
    for s, p, o, g in graphs.get(None, []):
        if p == T.LOG_IMPLIES and s in graphs and o in graphs:
            ant = [(a, b, c) for a, b, c, _ in graphs[s]]
            cons = [(a, b, c) for a, b, c, _ in graphs[o]]
            # quoted-graph bnodes -> vars (existential promotion)
            def promote(t, scope):
                if T.is_bnode(t):
                    return f"?{T.bnode_label(t)}_{scope}_undext"
                return t
            ant = [tuple(promote(t, s) for t in tr) for tr in ant]
            cons = [tuple(promote(t, o) for t in tr) for tr in cons]
            rules.append((ant, cons))
    return rules


def _pattern_bindings(triples_ds, pattern) -> pd.DataFrame:
    """Distributed single-pattern match: vectorized filter + projection
    to a bindings table (one column per variable)."""
    s, p, o = pattern

    def match(batch: pd.DataFrame) -> pd.DataFrame:
        mask = pd.Series(True, index=batch.index)
        var_cols: dict[str, list] = {}
        for term, col in ((s, "subj"), (p, "pred"), (o, "obj")):
            if not is_var(term):
                mask &= batch[col] == term
            else:
                var_cols.setdefault(term, []).append(col)
        # the same variable in two positions is an equality constraint
        # ({?x :rel ?x} must only match rows with subj == obj)
        for cols in var_cols.values():
            for extra in cols[1:]:
                mask &= batch[cols[0]] == batch[extra]
        sel = batch[mask]
        out = {}
        for term, cols in var_cols.items():
            out[term] = sel[cols[0]]
        if not out:
            out["__match__"] = pd.Series([True] * len(sel), index=sel.index)
        return pd.DataFrame(out)

    return triples_ds.map_batches(match, batch_format="pandas").materialize()


# Bindings frames at or below this row count are joined with plain
# pd.merge on the driver (fast path: rule antecedents are usually
# selective).  Above it, frames stay distributed and joins become
# bucket-paired merges — a non-selective pattern like (?s rdf:type ?c)
# over a 10^12-triple KB must never materialize on the driver.
_DRIVER_JOIN_LIMIT = 500_000


def _nrows(x) -> int:
    return len(x) if isinstance(x, pd.DataFrame) else x.count()


def _colnames(x) -> list[str]:
    if isinstance(x, pd.DataFrame):
        return list(x.columns)
    sch = x.schema()
    return list(sch.names) if sch is not None else []


def _shrink(x, limit: int):
    """Materialized bindings Dataset -> pandas when small enough."""
    if isinstance(x, pd.DataFrame) or x.count() > limit:
        return x
    return x.to_pandas()


def _coalesce(ds, n_rows: int | None = None, target_rows: int = 500_000,
              min_blocks: int = 8):
    """Bound a materialized Dataset's block count.

    Shuffle outputs inherit their input's block count, and unions of
    such outputs compound fragmentation across fixpoint iterations
    until per-block rows collapse and the next shuffle's map stage +
    driver ref bookkeeping dominate (measured: the same 1.75M x 600k
    bindings join runs 3.5x slower over 200-block inputs than over
    compact ones).  Ref-level repartition — concat tasks, no sort."""
    if n_rows is None:
        n_rows = ds.count()
    want = max(min_blocks, -(-n_rows // target_rows))
    if ds.num_blocks() > want * 2:
        return ds.repartition(want).materialize()
    return ds


def _dedup_bindings_ds(ds, cols):
    """Distributed exact dedup of a bindings Dataset (all-string
    columns): coarse hash bucket + vectorized in-bucket dedup."""
    cols = list(cols)

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        from ..stages.keys import bucket64

        return b.assign(__hb=bucket64(64, *[b[c] for c in cols]))

    return (ds.map_batches(bucket, batch_format="pandas")
            .groupby("__hb")
            .map_groups(lambda g: g.drop_duplicates(subset=cols),
                        batch_format="pandas")
            .drop_columns(["__hb"]).materialize())


def _bucket_merge(left, right, shared, num_buckets: int = 64):
    """Distributed equi-join of two bindings tables on their shared
    variable columns: both sides tagged with a hash bucket of the join
    key, unioned under one schema (all columns are string terms;
    missing ones null-filled), then a vectorized pd.merge inside each
    bucket.  Neither side ever materializes on the driver."""
    import pyarrow as pa
    import ray.data as rd

    lcols = _colnames(left)
    rcols = _colnames(right)
    all_cols = lcols + [c for c in rcols if c not in lcols]

    def tagger(cols, side):
        def tag(b: pd.DataFrame) -> pa.Table:
            from ..stages.keys import bucket64

            n = len(b)
            jb = bucket64(num_buckets, *[b[c] for c in shared])
            data = {"__jb": pa.array(jb, pa.int32()),
                    "__side": pa.array(np.full(n, side, dtype=np.int8))}
            for c in all_cols:
                data[c] = (pa.array(b[c].astype(str), pa.string())
                           if c in cols else pa.nulls(n, pa.string()))
            return pa.table(data)
        return tag

    if isinstance(left, pd.DataFrame):
        left = rd.from_pandas(left)
    if isinstance(right, pd.DataFrame):
        right = rd.from_pandas(right)
    tagged = left.map_batches(tagger(lcols, 0), batch_format="pandas").union(
        right.map_batches(tagger(rcols, 1), batch_format="pandas"))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g0 = g[g["__side"] == 0][lcols]
        g1 = g[g["__side"] == 1][rcols]
        return g0.merge(g1, on=shared)

    out = (tagged.groupby("__jb")
           .map_groups(join_bucket, batch_format="pandas").materialize())
    return _coalesce(out)


# Bindings sides at or below this row count are broadcast (ray.put
# once, per-batch pd.merge inside map_batches over the big side)
# instead of shuffling BOTH sides through a bucket exchange — the
# standard small-side gate every join in the repo uses.  ~2M two-column
# string rows is tens of MB in the object store; above it, the
# bucket-paired merge is the fallback that never gathers either side.
_JOIN_BROADCAST_LIMIT = 2_000_000


def _broadcast_merge(big, small: pd.DataFrame, shared):
    """Map-side equi-join: the small bindings frame rides the object
    store once; each big-side batch merges against it vectorized."""
    import ray
    import ray.data as rd

    if isinstance(big, pd.DataFrame):
        # a driver merge can fan out past the join limit, leaving a
        # DataFrame as the big side — lift it into a Dataset so the
        # probe still runs distributed
        big = rd.from_pandas(big)
    sref = ray.put(small)

    def join_batch(b: pd.DataFrame) -> pd.DataFrame:
        return b.merge(ray.get(sref), on=shared)

    return big.map_batches(join_batch, batch_format="pandas").materialize()


def _join2(out, pb):
    """One pairwise bindings join: driver pd.merge when both sides are
    already-shrunk pandas frames; broadcast map-side merge when one
    side fits the broadcast gate; distributed bucket merge otherwise."""
    small_out = isinstance(out, pd.DataFrame)
    small_pb = isinstance(pb, pd.DataFrame)
    shared = [c for c in _colnames(out) if c in _colnames(pb)]
    if small_out and small_pb:
        return out.merge(pb, on=shared) if shared else out.merge(pb, how="cross")
    if shared:
        n_out, n_pb = _nrows(out), _nrows(pb)
        small, big, n_small = ((out, pb, n_out) if n_out <= n_pb
                               else (pb, out, n_pb))
        if n_small <= _JOIN_BROADCAST_LIMIT:
            if not isinstance(small, pd.DataFrame):
                small = small.to_pandas()
            return _broadcast_merge(big, small, shared)
        return _bucket_merge(out, pb, shared)
    # cross join with a big side: broadcast the small side into a
    # per-batch cross merge over the big side (two big sides would be a
    # cartesian blow-up no engine should run — surface it)
    if not small_out and not small_pb:
        raise ValueError(
            "cross-join of two large bindings frames (no shared "
            "variables); reorder the rule's antecedent patterns")
    big, small = (out, pb) if small_pb else (pb, out)
    return big.map_batches(lambda b: b.merge(small, how="cross"),
                           batch_format="pandas").materialize()


def _join_seq(frames, limit: int | None = None,
              assume_unique: bool = False):
    """Join a sequence of bindings tables on shared variable columns;
    None = some pattern had no matches.  Frames arrive as materialized
    Datasets; small ones drop to the driver fast path, large ones stay
    distributed (bucket-paired merges).

    `assume_unique=True` skips the per-frame dedup: single-pattern
    bindings over a duplicate-free triple source are provably unique
    (every variable projects a distinct position of a unique (s, p, o)
    row, and equality-constrained repeats only shrink the match set),
    and an equi-join of unique tables stays unique — so when the KB,
    adds and delta are all exact sets, no dedup shuffle is needed
    anywhere in the join."""
    if limit is None:
        limit = _DRIVER_JOIN_LIMIT  # read at call time (testable)
    out = None
    for pb in frames:
        if _nrows(pb) == 0:
            return None
        if "__match__" in _colnames(pb):
            continue
        pb = _shrink(pb, limit)
        if not assume_unique:
            if isinstance(pb, pd.DataFrame):
                pb = pb.drop_duplicates()
            else:
                pb = _dedup_bindings_ds(pb, _colnames(pb))
        out = pb if out is None else _join2(out, pb)
        if out is not None and not isinstance(out, pd.DataFrame):
            out = _shrink(out, limit)
        if _nrows(out) == 0:
            return None
    return out if out is not None else pd.DataFrame([{}])


def _instantiate(bindings: pd.DataFrame, cons) -> pd.DataFrame:
    """Vectorized consequent instantiation: one column gather per
    template slot (no per-row iterrows).  Unbound existentials intern
    ONE node per variable label across all firings — the reference's
    RDF::Node.intern semantics (formula.rb:243)."""
    # Callers hand us frames straight out of drop_duplicates(), whose
    # gappy index would misalign against the fresh RangeIndex constant
    # Series below (pandas aligns on the index union, yielding
    # NaN-corrupted rows AND dropping valid bindings).
    bindings = bindings.reset_index(drop=True)
    frames = []
    n = len(bindings)
    for s, p, o in cons:
        cols = {}
        ok = True
        for slot, t in (("subj", s), ("pred", p), ("obj", o)):
            if is_var(t):
                if t in bindings.columns:
                    cols[slot] = bindings[t].astype(str)
                else:
                    cols[slot] = pd.Series([T.bnode(t[1:])] * n)
            else:
                cols[slot] = pd.Series([t] * n)
        if ok and n:
            df = pd.DataFrame(cols)
            # drop rows where a bound value is itself a variable
            mask = ~(df["subj"].str.startswith("?")
                     | df["pred"].str.startswith("?")
                     | df["obj"].str.startswith("?"))
            frames.append(df[mask])
    if not frames:
        return pd.DataFrame({"subj": pd.Series(dtype="object"),
                             "pred": pd.Series(dtype="object"),
                             "obj": pd.Series(dtype="object")})
    return pd.concat(frames, ignore_index=True).drop_duplicates()


def _instantiate_pieces(pieces, cons):
    """Instantiate a rule's consequent over hybrid join results: small
    (pandas) pieces on the driver, large (Dataset) pieces via a
    distributed map_batches — consequent triples for a non-selective
    rule never materialize on the driver.  Returns a pandas frame, a
    Dataset, or None when nothing was produced."""
    import pyarrow as pa

    small = [p for p in pieces if isinstance(p, pd.DataFrame)]
    big = [p for p in pieces if not isinstance(p, pd.DataFrame)]
    out_small = None
    if small:
        bindings = pd.concat(small, ignore_index=True)
        if len(bindings.columns):
            bindings = bindings.drop_duplicates()
        inst = _instantiate(bindings, cons)
        if len(inst):
            out_small = inst
    if not big:
        return out_small

    def inst_batch(b: pd.DataFrame) -> pa.Table:
        df = _instantiate(b, cons)
        return pa.table({c: pa.array(df[c].astype(str).tolist(), pa.string())
                         for c in ("subj", "pred", "obj")})

    out = big[0]
    for extra in big[1:]:
        out = out.union(extra)
    out = out.map_batches(inst_batch, batch_format="pandas")
    if out_small is not None:
        import ray.data as rd

        out = out.union(rd.from_pandas(out_small))
    return out


def reason_dataset(triples_ds, rules, max_iterations: int = 10,
                   num_buckets: int = 64,
                   hash_broadcast_limit: int = 20_000_000):
    """Fixed-point rule application over an in-memory triple Dataset.

    `triples_ds` columns: subj, pred, obj.  Returns (closure_ds,
    n_inferred).  One exact-dedup shuffle establishes set semantics
    over the input, then the shared semi-naive core (_reason_fixpoint
    — the same machinery reason_kb_path runs over a partitioned
    parquet KB) keeps deltas, the seen-set, and the cumulative adds
    distributed; the closure is the deduped base union the inferred
    additions, with only counts crossing the driver."""
    # one dedup shuffle: the core's assume_unique joins and its
    # "re-derivations are not inferences" anti-join both require the
    # base to be an exact set (repository set semantics,
    # reasoner.rb:123-140)
    base = _dedup_bindings_ds(triples_ds.materialize(), _TCOLS)
    adds, inferred_total = _reason_fixpoint(
        lambda pattern: base, [base], rules, num_buckets=num_buckets,
        max_iterations=max_iterations,
        hash_broadcast_limit=hash_broadcast_limit)
    closure = base if inferred_total == 0 else base.union(adds)
    return closure, inferred_total


# ---------------------------------------------------------------------------
# Predicate-partitioned KB on Parquet: the 100 TB layout.  A pattern
# with a ground predicate reads ONLY its hash-bucket partition from
# storage — no full scan per pattern per iteration.
# ---------------------------------------------------------------------------

def _pred_bucket_of(pred: str, num_buckets: int) -> int:
    import hashlib

    h = hashlib.blake2b(pred.encode(), digest_size=8).digest()
    return int.from_bytes(h, "big") % num_buckets


def write_kb_partitioned(triples_ds, out_dir: str, num_buckets: int = 64):
    """Land a triple Dataset as predicate-hash-bucketed Parquet:
    out_dir/pb=K/*.parquet."""
    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(pb=b["pred"].map(
            lambda p: _pred_bucket_of(p, num_buckets)).astype("int32"))

    triples_ds.map_batches(add_bucket, batch_format="pandas").write_parquet(
        out_dir, partition_cols=["pb"])


def _pruned_kb_read(kb_dir: str, pattern, num_buckets: int):
    """Dataset over only the partitions a pattern can match."""
    import glob as _glob
    import os

    import ray.data as rd

    _, p, _ = pattern
    if not is_var(p):
        files = sorted(_glob.glob(os.path.join(
            kb_dir, f"pb={_pred_bucket_of(p, num_buckets)}", "*.parquet")))
        if not files:
            return None
        return rd.read_parquet(files, columns=["subj", "pred", "obj"])
    return rd.read_parquet(kb_dir, columns=["subj", "pred", "obj"])


def _triple_hash128(b: pd.DataFrame) -> tuple[pd.Series, pd.Series]:
    """Two independent 64-bit hashes of (subj, pred, obj) -> 128-bit
    key; collision probability over 10^12 triples ~2^-104 (same
    argument as stages/dedup._quad_key128).  Keys come from the same
    stages/keys nul_join+hash128 builder the dedup/join sites use, so
    the hash identity cannot drift between them."""
    from ..stages.keys import hash128, nul_join

    # fill_null="None" == the old astype(str) coercion: without a
    # fill, a null in ANY column nulls the joined key and every such
    # row would collapse to one 128-bit identity (review r5)
    h1, h2 = hash128(nul_join(*[b[c] for c in _TCOLS], fill_null="None"))
    return pd.Series(h1, index=b.index), pd.Series(h2, index=b.index)


def _triple_hash_ds(triples_ds):
    """Project a triple Dataset to its 16-byte/row (h1, h2) sidecar."""
    def proj(b: pd.DataFrame) -> pd.DataFrame:
        h1, h2 = _triple_hash128(b)
        return pd.DataFrame({"h1": h1, "h2": h2})

    return triples_ds.map_batches(proj, batch_format="pandas")


_TCOLS = ["subj", "pred", "obj"]


def reason_kb_path(kb_dir: str, rules, num_buckets: int = 64,
                   max_iterations: int = 10,
                   hash_broadcast_limit: int = 20_000_000):
    """Fixed point over a predicate-partitioned Parquet KB.

    Base facts stay on storage; pattern scans with ground predicates are
    partition-pruned reads.  Deltas and the seen-set stay DISTRIBUTED:
    each iteration's candidate consequents are exact-deduped by a
    distributed shuffle, then anti-joined by 128-bit hash
    (stages/antijoin.hash_anti_join — the KG append machinery) against
    the union of (a) the base-KB hash sidecar, pruned to the rules'
    consequent predicates, and (b) every previously inferred triple's
    hashes.  Only per-iteration COUNTS cross the driver, so a productive
    ruleset (transitive closure over a 10^6-edge relation) runs with
    bounded driver memory; above `hash_broadcast_limit` seen-hashes the
    anti-join switches from broadcast probe to h1-bucket co-group.

    Returns (adds_ds, n_inferred): a Dataset (union of materialized
    per-iteration parts) of the inferred triples (base re-derivations
    are not inferences); the full closure is the base KB union the
    returned additions.

    Precondition: the KB at `kb_dir` is an exact set (repository set
    semantics — the KG build/append pipelines land deduped triples).
    That invariant makes every single-pattern bindings table unique,
    so the joins run with `assume_unique=True` (no per-pattern dedup
    shuffle) and the only per-iteration exchange beyond the bindings
    join itself is ONE fused dedup+anti-join shuffle.  Base-pattern
    bindings are scanned once and cached across iterations; each
    iteration extends them with bindings over that iteration's delta
    only (semi-naive all the way down to the scans).
    """
    # Seed the seen-set with the base triples a firing could re-derive:
    # an instantiated consequent's predicate is either the template's
    # ground predicate or a variable binding (unbounded), so prune the
    # base hash scan to the ground consequent predicates — or read the
    # whole KB only when some consequent predicate is a variable.
    cons_preds: set[str] = set()
    full_scan = False
    for _, cons in rules:
        for _, p, _ in cons:
            if is_var(p):
                full_scan = True
            else:
                cons_preds.add(p)
    base_parts = []
    if full_scan:
        src = _pruned_kb_read(kb_dir, ("?s", "?p", "?o"), num_buckets)
        if src is not None:
            base_parts.append(src)
    else:
        for p in sorted(cons_preds):
            src = _pruned_kb_read(kb_dir, ("?s", p, "?o"), num_buckets)
            if src is not None:
                # the pb=K partition holds every predicate in the hash
                # bucket — keep only this predicate's rows
                base_parts.append(src.map_batches(
                    lambda b, _p=p: b[b["pred"] == _p],
                    batch_format="pandas"))
    return _reason_fixpoint(
        lambda pattern: _pruned_kb_read(kb_dir, pattern, num_buckets),
        base_parts, rules, num_buckets=num_buckets,
        max_iterations=max_iterations,
        hash_broadcast_limit=hash_broadcast_limit)


def _reason_fixpoint(read_pattern, seed_parts, rules, *, num_buckets,
                     max_iterations, hash_broadcast_limit):
    """Shared semi-naive fixpoint core over a duplicate-free base KB.

    `read_pattern(pattern)` -> Dataset|None over the base facts (a
    partition-pruned parquet read, or an in-memory materialized
    Dataset); `seed_parts` are triple Datasets whose hashes seed the
    seen-set (the base facts a firing could re-derive).  Returns
    (adds_ds, n_inferred) — inferred triples only, never the base.
    """
    import ray.data as rd

    from ..stages.antijoin import BroadcastHashSet, hash_anti_join

    adds_parts: list = []  # materialized per-iteration inferred triples
    delta = None           # materialized Dataset: last iteration's additions
    inferred_total = 0

    # The seen-set lives in TWO forms: `seen_parts` (materialized 16-
    # byte/row hash Datasets — the distributed truth) and, while the
    # set is broadcast-sized, `bset`, a driver mirror of lexsorted
    # numpy arrays merged incrementally.  hash_anti_join's one-shot
    # broadcast path would re-gather + re-sort + re-put the FULL
    # cumulative set every fixpoint iteration; the mirror makes each
    # iteration pay one C-speed merge of just the delta.  Crossing
    # `hash_broadcast_limit` drops the mirror for good and probes via
    # the h1-bucket co-group over `seen_parts`.
    seen_parts: list = []
    n_seen = 0
    bset: BroadcastHashSet | None = BroadcastHashSet()
    if seed_parts:
        s = seed_parts[0]
        for extra in seed_parts[1:]:
            s = s.union(extra)
        base_h = _triple_hash_ds(s).materialize()
        seen_parts.append(base_h)
        n_seen = base_h.count()
        if n_seen <= hash_broadcast_limit:
            hdf = base_h.to_pandas()
            bset.extend(hdf["h1"].to_numpy(), hdf["h2"].to_numpy())
        else:
            bset = None

    # Cross-iteration bindings caches.  base_bind[p] is the one-time
    # materialized bindings scan of the base KB (partition-pruned);
    # adds_bind[p] accumulates bindings over each inferred delta as it
    # lands, so iteration k never rescans parquet or re-filters earlier
    # deltas — the "full KB" side of a slot is a ref-moving union.
    base_bind: dict = {}
    adds_bind: dict = {}
    folded: dict = {}  # pattern -> len(adds_parts) already folded in

    def full_bindings(pattern):
        if pattern not in base_bind:
            src = read_pattern(pattern)
            base_bind[pattern] = (
                None if src is None else _pattern_bindings(src, pattern))
        lst = adds_bind.setdefault(pattern, [])
        for part in adds_parts[folded.get(pattern, 0):]:
            pbind = _pattern_bindings(part, pattern)
            if pbind.count():
                lst.append(pbind)
        folded[pattern] = len(adds_parts)
        parts = [b for b in (base_bind[pattern], *lst) if b is not None]
        if not parts:
            return pd.DataFrame()
        out = parts[0]
        for extra in parts[1:]:
            out = out.union(extra)
        return out

    for _ in range(max_iterations):
        new_rows = []
        cache: dict[tuple, pd.DataFrame] = {}

        def pb(pattern, use_delta):
            key = (pattern, use_delta)
            if key not in cache:
                if use_delta:
                    cache[key] = (pd.DataFrame() if delta is None
                                  else _pattern_bindings(delta, pattern))
                else:
                    cache[key] = full_bindings(pattern)
            return cache[key]

        for ant, cons in rules:
            if delta is None:
                slots = [[pb(p, False) for p in ant]]
            else:
                slots = [[pb(p, j == i) for j, p in enumerate(ant)]
                         for i in range(len(ant))]
            pieces = [b for b in
                      (_join_seq(fr, assume_unique=True) for fr in slots)
                      if b is not None]
            if not pieces:
                continue
            inst = _instantiate_pieces(pieces, cons)
            if inst is None:
                continue
            if isinstance(inst, pd.DataFrame):
                if len(inst):
                    new_rows.append(rd.from_pandas(inst))
            else:
                new_rows.append(inst)
        if not new_rows:
            break
        cand = new_rows[0]
        for extra in new_rows[1:]:
            cand = cand.union(extra)
        # ONE fused shuffle: exact-dedup this iteration's candidates by
        # 128-bit hash AND anti-join them against base + everything
        # already inferred (slot overlap / multi-derivation dups die
        # in the same exchange that drops re-derivations)
        if bset is not None:
            fresh = bset.filter_novel(
                cand, hash_fn=_triple_hash128, cols=_TCOLS,
                dedup_left=True, num_buckets=num_buckets).materialize()
        else:
            seen_ds = None
            if seen_parts:
                seen_ds = seen_parts[0]
                for extra in seen_parts[1:]:
                    seen_ds = seen_ds.union(extra)
            fresh = hash_anti_join(
                cand, seen_ds, hash_fn=_triple_hash128, cols=_TCOLS,
                broadcast_limit=0,  # mirror dropped => stay bucketed
                num_buckets=num_buckets, dedup_left=True).materialize()
        n_new = fresh.count()
        if n_new == 0:
            break
        fresh = _coalesce(fresh, n_new)
        inferred_total += n_new
        fresh_h = _triple_hash_ds(fresh).materialize()
        # unions of materialized datasets move block refs, not data —
        # never re-materialize the cumulative adds/seen per iteration
        seen_parts.append(fresh_h)
        n_seen += n_new
        if bset is not None:
            if n_seen <= hash_broadcast_limit:
                fdf = fresh_h.to_pandas()
                bset.extend(fdf["h1"].to_numpy(), fdf["h2"].to_numpy())
            else:
                bset = None  # crossed the gate; bucket path from here
        delta = fresh
        adds_parts.append(fresh)
    if not adds_parts:
        return rd.from_pandas(pd.DataFrame(
            {c: pd.Series(dtype="object") for c in _TCOLS})), 0
    adds = adds_parts[0]
    for extra in adds_parts[1:]:
        adds = adds.union(extra)
    return adds, inferred_total
