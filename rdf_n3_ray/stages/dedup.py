"""Exact triple deduplication — the KG materialize shuffle.

Reference semantics: repository insert is idempotent / set-based
(/root/reference/lib/rdf/n3/repository.rb:297-313).  At scale this is
the one required wide stage (SURVEY.md §2.6): key = 64-bit hash of the
full (subj, pred, obj, graph) quad, with exact within-group comparison
so hash collisions cannot merge distinct triples.

Combiner pattern: each batch drops its local duplicates BEFORE the
shuffle (map-side pre-aggregation), so shuffle bytes are proportional to
the distinct-triple count of each batch, not the raw row count.  The
hash key is uniform by construction, so this shuffle has no key skew —
the conv_id skew of the input (hot conversations) is dissolved here, and
the salted-repartition concern only applies to conv-keyed stages.

Winner per duplicate set is deterministic: min (conv_id, turn_idx) —
re-running or resuming yields byte-identical output.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .keys import hash64, hash128, nul_join

_QUAD_COLS = ["subj", "pred", "obj", "graph"]


def _quad_key_table(tbl: pa.Table):
    """Single source of truth for the quad key construction: NUL-
    joined (subj, pred, obj, graph) with "\\x01" for an absent graph.
    Arrow-native (stages/keys.py): the previous pandas string concat
    both paid an object round trip per batch on every triple in the
    job AND silently lost its NUL separators to numpy scalar coercion
    (see keys.py module docstring)."""
    return nul_join(tbl.column("subj"), tbl.column("pred"),
                    tbl.column("obj"), tbl.column("graph"),
                    fill_null="\x01")


def _quad_key128_table(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes of the quad -> 128-bit key,
    straight off an Arrow batch."""
    return hash128(_quad_key_table(tbl))


def _pd_quads_to_table(df: pd.DataFrame) -> pa.Table:
    return pa.table({c: pa.array(df[c], type=pa.string(),
                                 from_pandas=True) for c in _QUAD_COLS})


def _quad_key(df: pd.DataFrame) -> pd.Series:
    """64-bit quad hash (one hash pass; the wide path never needs h2)."""
    return pd.Series(hash64(_quad_key_table(_pd_quads_to_table(df))),
                     index=df.index)


def local_dedup(batch: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    """Map-side combiner: drop in-batch duplicate quads, add the shuffle
    bucket, keep min-(conv_id, turn_idx) lineage for determinism."""
    batch = batch.sort_values(["conv_id", "turn_idx"], kind="stable")
    batch = batch.drop_duplicates(subset=_QUAD_COLS, keep="first")
    batch = batch.assign(tbucket=(_quad_key(batch) % num_buckets).astype(np.int32))
    return batch


def group_dedup(group: pd.DataFrame) -> pd.DataFrame:
    """Reduce side: vectorized exact dedup within one hash bucket.

    The groupby key is a COARSE bucket (hash % B), not the full quad
    hash: Ray's map_groups invokes the UDF once per group, so fine keys
    (~1 row per group) would pay per-group Python overhead for every
    distinct triple.  B buckets keep groups large and the dedup inside
    fully vectorized; identical quads always share a bucket, so the
    result is still exact."""
    group = group.sort_values(["conv_id", "turn_idx"], kind="stable")
    return group.drop_duplicates(subset=_QUAD_COLS, keep="first")


def _quad_key128(df: pd.DataFrame) -> tuple[pd.Series, pd.Series]:
    """Two independent 64-bit hashes of the quad -> 128-bit key.
    Collision probability over 10^12 triples ~ 2^-104: exactness is
    cryptographic-negligible rather than compare-full-quad, which is the
    price of the narrow shuffle below.  pandas adapter over
    `_quad_key128_table` (Arrow is the hot path)."""
    h1, h2 = _quad_key128_table(_pd_quads_to_table(df))
    return pd.Series(h1, index=df.index), pd.Series(h2, index=df.index)


_IDENT_KEY2 = "rdf_n3_ident_2__"  # 16 chars, pandas hash_key contract
_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _ident_key128(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """128-bit hash of the physical row id (conv_id, turn_idx,
    emit_idx) — same collision argument as `_quad_key128`.

    Construction: (turn_idx << 32) | emit_idx packs the two int32s
    injectively; XORing its odd-multiplier bijections into two
    INDEPENDENT keyed hashes of the conv_id string gives per-conv
    injectivity exactly and cross-conv collisions at ~2^-128 per pair.
    (pandas' `hash_key` only seeds object-dtype hashing, so hashing the
    whole frame twice would NOT give two independent hashes of the
    numeric columns — hence the explicit mix.)"""
    # categorize=False: conv_id is corpus data; the default hasher
    # truncates at an embedded NUL, which would collapse the row-id
    # hashes of distinct conversations sharing a prefix (identity-
    # bearing — drop_losers removes rows by exactly these keys)
    c1 = pd.util.hash_pandas_object(
        df["conv_id"], index=False, categorize=False).to_numpy()
    c2 = pd.util.hash_pandas_object(
        df["conv_id"], index=False, hash_key=_IDENT_KEY2,
        categorize=False).to_numpy()
    te = ((df["turn_idx"].to_numpy().astype(np.uint64) << np.uint64(32))
          | df["emit_idx"].to_numpy().astype(np.uint64))
    i1 = c1 ^ (te * _MIX1)
    i2 = c2 ^ (te * _MIX2)
    return (i1.view(np.int64), i2.view(np.int64))


def _make_drop_losers(lose_ref, ident):
    """Task-pool anti-join stage: `ray.get` the broadcast loser key
    arrays per TASK — zero-copy plasma mmap for numpy int64, so the
    per-task cost is a metadata lookup, not a deserialize — then filter
    each batch with a vectorized sorted-membership probe
    (`antijoin.span_membership`) on the 128-bit row-id hash.

    History of this stage (each step measured at sf0.1):
    - pandas MultiIndex.isin probe cost more than the loser shuffle
      itself (string tuples, per-actor index build);
    - the hash probe (two `hash_pandas_object` passes + searchsorted
      per batch) cut the stage 5-8.7s -> 2.2-3.4s;
    - an ACTOR pool then paid a ~10x startup storm per call purely to
      cache a broadcast that was already zero-copy — plain tasks win.

    Arrow-native on purpose: only the three narrow ident columns are
    converted to pandas for the probe; the wide IRI string columns are
    filtered zero-copy, and the batch keeps its Arrow schema (a pandas
    round-trip re-infers an all-null `graph` block as type Null, which
    the polars sort path refuses to concat with String blocks)."""

    def drop_losers(batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        import ray

        keys = ray.get(lose_ref)
        if keys is None:
            return batch.drop(["emit_idx"])
        from .antijoin import span_membership

        ident_df = batch.select(ident).to_pandas()
        i1, i2 = _ident_key128(ident_df)
        mask = span_membership(keys[0], keys[1], i1, i2)
        return batch.filter(pa.array(~mask)).drop(["emit_idx"])

    return drop_losers


def dedup_triples_narrow(ds, num_buckets: int = 64,
                         loser_broadcast_limit: int = 20_000_000):
    """Exact dedup where ONLY (h1, h2, conv_id, turn_idx) goes through
    the shuffle — full triple rows never move.

    1. materialize ds once (at job scale this is the checkpointed shard
       parquet, not memory);
    2. project to 128-bit quad-hash + lineage, in-batch combine;
    3. groupby(coarse bucket) -> LOSER rows (all but the min-ident copy
       of each distinct quad): a ~28-byte/row shuffle instead of full
       IRI strings;
    4. broadcast the loser set (ray.put once; read once per ACTOR via
       DropLosers.__init__) and anti-join each batch against it by the
       globally-unique physical row id — no quad re-hashing.
       Scale gate: a loser set above ``loser_broadcast_limit`` rows
       (~0.5 GiB of row ids at the default 20M) means the duplicate
       fraction is too large to broadcast — fall back to the wide
       full-row shuffle (`dedup_triples`), which never collects
       anything to the driver.
    """
    import ray

    src = ds.materialize()

    ident = ["conv_id", "turn_idx", "emit_idx"]

    def project(batch: pa.Table) -> pa.Table:
        # Arrow-native: the wide IRI columns never convert to pandas;
        # only the joined key string is materialized for the hasher
        h1, h2 = _quad_key128_table(batch)
        cols = {"h1": pa.array(h1, pa.int64()),
                "h2": pa.array(h2, pa.int64())}
        for c in ident:
            cols[c] = batch.column(c)
        cols["tbucket"] = pa.array((h1 % num_buckets).astype(np.int32),
                                   pa.int32())
        return pa.table(cols)

    def losers(group: pd.DataFrame) -> pd.DataFrame:
        """128-bit row-id hashes of everything except the min-ident
        copy of each distinct quad.  Hashing on the reduce side keeps
        the shuffle narrow (the ident columns were needed anyway for
        the deterministic winner order)."""
        group = group.sort_values(ident, kind="stable")
        dup = group.duplicated(subset=["h1", "h2"], keep="first")
        i1, i2 = _ident_key128(group.loc[dup, ident])
        return pd.DataFrame({"i1": i1, "i2": i2})

    lose = (src.map_batches(project, batch_format="pyarrow")
            .groupby("tbucket").map_groups(losers, batch_format="pandas")
            .materialize())  # narrow (ids only); consumed twice below
    if lose.count() > loser_broadcast_limit:
        # duplicate fraction too large for a driver round-trip: wide path
        return dedup_triples(src, num_buckets=num_buckets)
    lose_df = lose.to_pandas()
    # (conv_id, turn_idx, emit_idx) is a globally unique physical row
    # id, so the broadcast loser set needs ONLY its 128-bit hash — each
    # entry removes exactly one row, no cross-block ambiguity even when
    # Ray splits a turn's rows.  Keying the anti-join by row id (not by
    # quad hash) means drop_losers never re-hashes the long IRI strings
    # per batch: that second _quad_key128 pass used to cost as much CPU
    # as the parse stage itself.  Broadcast payload = two lexsorted
    # int64 arrays: plasma-mmap zero-copy on every actor, no index
    # build (16 bytes/loser at the 20M gate = ~320 MB worst case).
    if len(lose_df):
        li1 = lose_df["i1"].to_numpy()
        li2 = lose_df["i2"].to_numpy()
        order = np.lexsort((li2, li1))
        lose_keys = (li1[order], li2[order])
    else:
        lose_keys = None
    lose_ref = ray.put(lose_keys)

    return src.map_batches(
        _make_drop_losers(lose_ref, ident), batch_format="pyarrow")


def dedup_triples(ds, batch_size: int | None = None, num_buckets: int = 64):
    """Exact quad dedup: combiner -> groupby(bucket) -> vectorized first.

    `num_buckets` bounds reduce-partition size: at larger scale set
    B ≈ input_bytes / 256 MiB so each bucket group fits a worker.
    """
    keyed = ds.map_batches(
        lambda b: local_dedup(b, num_buckets),
        batch_format="pandas", batch_size=batch_size,
    )
    out = keyed.groupby("tbucket").map_groups(group_dedup, batch_format="pandas")
    drop = ["tbucket"]
    if "emit_idx" in ds.schema().names:
        drop.append("emit_idx")
    return out.drop_columns(drop)


def dedup_pairs(pairs_ds, num_buckets: int = 64, keep_cols=None):
    """Global exact dedup of an (a, b[, ...]) pair Dataset via a coarse
    bucket shuffle (per-pair fine keys would pay Ray's per-group UDF
    overhead once per pair).  Used by the near-dup pipelines."""
    def key(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(pb=((b["a"].astype("int64") * 1_000_003
                             + b["b"].astype("int64"))
                            % num_buckets).astype("int32"))

    cols = keep_cols

    def drop(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["a", "b"])
        return g[cols] if cols else g.drop(columns=["pb"])

    return (pairs_ds.map_batches(key, batch_format="pandas")
            .groupby("pb").map_groups(drop, batch_format="pandas"))
