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


def local_dedup(batch: pd.DataFrame) -> pd.DataFrame:
    """Map-side combiner: drop in-batch duplicate quads, add the shuffle
    key, keep min-(conv_id, turn_idx) lineage for determinism."""
    batch = batch.sort_values(["conv_id", "turn_idx"], kind="stable")
    batch = batch.drop_duplicates(subset=_QUAD_COLS, keep="first")
    batch = batch.assign(tkey=_quad_key(batch))
    return batch


def group_dedup(group: pd.DataFrame) -> pd.DataFrame:
    """Reduce side: exact dedup within one hash-key group (collision-safe)."""
    group = group.sort_values(["conv_id", "turn_idx"], kind="stable")
    return group.drop_duplicates(subset=_QUAD_COLS, keep="first")


def dedup_triples(ds, batch_size: int = 65536):
    """groupby(quad-hash) -> first; returns a Dataset without the key col."""
    keyed = ds.map_batches(local_dedup, batch_format="pandas", batch_size=batch_size)
    out = keyed.groupby("tkey").map_groups(group_dedup, batch_format="pandas")
    return out.drop_columns(["tkey"])
