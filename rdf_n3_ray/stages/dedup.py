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

_QUAD_COLS = ["subj", "pred", "obj", "graph"]


def _quad_key(df: pd.DataFrame) -> pd.Series:
    key = (
        df["subj"].astype(str)
        + "\x00" + df["pred"].astype(str)
        + "\x00" + df["obj"].astype(str)
        + "\x00" + df["graph"].fillna("\x01").astype(str)
    )
    return pd.util.hash_pandas_object(key, index=False).astype(np.int64)


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
    return out.drop_columns(["tbucket"])
