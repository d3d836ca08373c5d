"""Skew-aware partitioning helpers (north-rule: salted repartitioning
to absorb conv_id skew at 10^12-turn scale; SURVEY.md §4).

A conversation with millions of turns would otherwise concentrate in
one hash bucket of any conv_id-keyed groupby.  When the operation only
needs atomicity at a FINER grain (a turn, a (conv, turn) document),
salt the bucket key with that grain; when it genuinely needs the whole
conversation together, spread it over `salt` sub-buckets and merge the
(small) per-bucket partials afterwards.
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def turn_bucket(batch: pd.DataFrame, num_buckets: int = 64,
                col: str = "tbucket") -> pd.DataFrame:
    """Bucket by hash(conv_id, turn_idx): keeps each turn's rows
    together while dissolving conversation-level skew entirely."""
    from .keys import hash64, nul_join

    h = hash64(nul_join(batch["conv_id"].astype(str),
                        batch["turn_idx"].astype(str)))
    return batch.assign(**{col: (h % num_buckets).astype("int32")})


def salted_conv_bucket(batch: pd.DataFrame, num_buckets: int = 64,
                       salt: int = 8, col: str = "sbucket") -> pd.DataFrame:
    """Bucket by (hash(conv_id), hash(turn_idx) % salt): a hot
    conversation spreads over `salt` buckets; per-conversation
    aggregates must merge the `salt` partials in a second (tiny)
    pass keyed by conv_id alone."""
    hc = pd.util.hash_pandas_object(batch["conv_id"].astype(str),
                                    index=False).astype(np.int64)
    ht = pd.util.hash_pandas_object(batch["turn_idx"], index=False)
    salted = (hc * np.int64(salt) + (ht % salt).astype(np.int64))
    return batch.assign(**{col: (salted % num_buckets).astype("int32")})
