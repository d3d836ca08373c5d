"""128-bit-hash anti-join building blocks.

Shared by the incremental KG append path (pipelines/kg.py) and the
partitioned-KB reasoner (pipelines/reasoning.py): given a left Dataset
of rows and a right Dataset of 16-byte (h1, h2) keys, keep the left
rows whose key is absent on the right.

Two execution shapes, size-gated like every small-side join in the
repo:

- **broadcast** (right side <= `broadcast_limit` rows): the right keys
  are sorted once on the driver and `ray.put` once; each left batch
  does a fully-vectorized sorted-membership probe
  (`span_membership`) — no Python per-row loop even when every left
  row collides on h1 (the idempotent re-ingest hot path).
- **bucket** (right side larger): both sides are tagged with
  `h1 % num_buckets`, unioned under ONE schema with identical dtypes
  (repo idiom — None-filled object columns would coerce typed columns
  and drift written parquet schemas), and anti-joined per bucket with
  a vectorized merge.  Only 16-byte keys move for the right side.

With `dedup_left=True` the surviving left rows are ALSO exact-deduped
by their 128-bit key (collision bound ~2^-104 over 10^12 rows, same
argument as stages/dedup._quad_key128) inside the SAME shuffle — the
reasoner's per-iteration "dedup candidates, subtract seen" step runs
as one exchange instead of two.  On the broadcast path the membership
probe filters per batch FIRST, so only the novel survivors enter the
dedup shuffle.
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def span_membership(eh1: np.ndarray, eh2: np.ndarray,
                    h1v: np.ndarray, h2v: np.ndarray) -> np.ndarray:
    """Vectorized membership test of (h1v, h2v) key pairs against
    reference arrays lexsorted by (h1, h2).

    searchsorted gives each probe its equal-h1 span in the reference;
    the h2 comparison then runs as `max_span` vectorized passes over
    ALL probes (equal-h1 spans of a 64-bit hash are ~1 long, so this is
    one or two numpy passes, never a Python loop over hit rows)."""
    if len(eh1) == 0 or len(h1v) == 0:
        return np.zeros(len(h1v), dtype=bool)
    left = np.searchsorted(eh1, h1v, side="left")
    right = np.searchsorted(eh1, h1v, side="right")
    hit = np.zeros(len(h1v), dtype=bool)
    max_span = int((right - left).max())
    for j in range(max_span):
        pos = left + j
        valid = pos < right
        idx = np.where(valid, pos, 0)
        hit |= valid & (eh2[idx] == h2v)
    return hit


class BroadcastHashSet:
    """Incrementally-maintained sorted 128-bit key set for repeated
    broadcast anti-join probes (the reasoner's fixpoint loop).

    hash_anti_join's broadcast path gathers + sorts + ray.puts the FULL
    right side on every call — fine for one-shot appends, quadratic
    driver work across fixpoint iterations.  This keeps the lexsorted
    (h1, h2) numpy arrays on the driver, merges each iteration's delta
    with one C-speed concat+lexsort, and re-puts the arrays once per
    extend; probes reuse the ref."""

    def __init__(self):
        self.h1 = np.empty(0, dtype=np.int64)
        self.h2 = np.empty(0, dtype=np.int64)
        self._ref = None

    def __len__(self):
        return len(self.h1)

    def extend(self, h1: np.ndarray, h2: np.ndarray):
        h1 = np.concatenate([self.h1, np.asarray(h1, dtype=np.int64)])
        h2 = np.concatenate([self.h2, np.asarray(h2, dtype=np.int64)])
        order = np.lexsort((h2, h1))
        self.h1, self.h2 = h1[order], h2[order]
        self._ref = None  # re-put lazily on next probe

    def filter_novel(self, left_ds, *, hash_fn, cols,
                     dedup_left: bool = False, num_buckets: int = 64):
        """Left rows whose key is absent from this set; optionally
        exact-deduped by key in one groupby (same semantics as
        hash_anti_join(dedup_left=True))."""
        import ray

        if self._ref is None and len(self.h1):
            self._ref = ray.put((self.h1, self.h2))
        href = self._ref
        cols = list(cols)

        def anti(b: pd.DataFrame) -> pd.DataFrame:
            h1, h2 = hash_fn(b)
            if href is not None:
                eh1, eh2 = ray.get(href)
                novel = ~span_membership(
                    eh1, eh2, h1.to_numpy(), h2.to_numpy())
            else:
                novel = np.ones(len(b), dtype=bool)
            if not dedup_left:
                return b[novel]
            out = b[novel].copy()
            out["h1"] = h1[novel]
            out["h2"] = h2[novel]
            out["hb"] = (out["h1"] % num_buckets).astype("int32")
            return out

        probed = left_ds.map_batches(anti, batch_format="pandas",
                                     batch_size=65536)
        if not dedup_left:
            return probed
        return (probed.groupby("hb")
                .map_groups(lambda g: g.drop_duplicates(
                    subset=["h1", "h2"])[cols], batch_format="pandas"))


def _default_sentinels(cols):
    def sentinels(n: int) -> dict:
        return {c: np.full(n, "", dtype=object) for c in cols}
    return sentinels


def hash_anti_join(left_ds, right_hashes_ds, *, hash_fn, cols,
                   sentinel_fn=None, broadcast_limit: int = 20_000_000,
                   num_buckets: int = 64, dedup_left: bool = False):
    """Left rows whose 128-bit key is absent from the right key set.

    left_ds        : Dataset whose batches contain `cols`
    right_hashes_ds: materialized Dataset with int64 columns h1, h2
                     (16 bytes/row — e.g. a KG hash sidecar), or None /
                     empty for a no-op
    hash_fn        : pandas batch -> (h1 Series, h2 Series)
    cols           : the payload columns to carry through
    sentinel_fn    : n -> {col: filler array} with dtypes matching the
                     left schema, for the bucket path's union (defaults
                     to all-string "" fillers)
    dedup_left     : also exact-dedup the surviving left rows by their
                     128-bit key, fused into the same shuffle
    """
    import ray
    import ray.data as rd

    if isinstance(right_hashes_ds, pd.DataFrame):
        right_hashes_ds = rd.from_pandas(right_hashes_ds)
    n_right = 0
    if right_hashes_ds is not None:
        right_hashes_ds = right_hashes_ds.materialize()
        n_right = right_hashes_ds.count()
    if n_right == 0 and not dedup_left:
        return left_ds
    cols = list(cols)

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["h1", "h2"])[cols]

    if n_right <= broadcast_limit:
        if n_right:
            hdf = right_hashes_ds.to_pandas().sort_values(
                ["h1", "h2"], kind="stable")
            href = ray.put((hdf["h1"].to_numpy(), hdf["h2"].to_numpy()))
        else:
            href = None

        def anti(b: pd.DataFrame) -> pd.DataFrame:
            h1, h2 = hash_fn(b)
            if href is not None:
                eh1, eh2 = ray.get(href)
                novel = ~span_membership(
                    eh1, eh2, h1.to_numpy(), h2.to_numpy())
            else:
                novel = np.ones(len(b), dtype=bool)
            if not dedup_left:
                return b[novel]
            out = b[novel].copy()
            out["h1"] = h1[novel]
            out["h2"] = h2[novel]
            out["hb"] = (out["h1"] % num_buckets).astype("int32")
            return out

        probed = left_ds.map_batches(anti, batch_format="pandas",
                                     batch_size=65536)
        if not dedup_left:
            return probed
        return (probed.groupby("hb")
                .map_groups(dedup_bucket, batch_format="pandas"))

    sentinel_fn = sentinel_fn or _default_sentinels(cols)

    def tag_new(b: pd.DataFrame) -> pd.DataFrame:
        h1, h2 = hash_fn(b)
        b = b.assign(h1=h1, h2=h2,
                     hb=(h1 % num_buckets).astype("int32"))
        b["side"] = np.int8(0)
        return b[[*cols, "h1", "h2", "hb", "side"]]

    def tag_old(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(sentinel_fn(len(b)))
        out["h1"] = b["h1"].to_numpy()
        out["h2"] = b["h2"].to_numpy()
        out["hb"] = (b["h1"].to_numpy() % num_buckets).astype("int32")
        out["side"] = np.int8(1)
        return out[[*cols, "h1", "h2", "hb", "side"]]

    def anti_bucket(g: pd.DataFrame) -> pd.DataFrame:
        new = g[g["side"] == 0]
        if dedup_left:
            new = new.drop_duplicates(subset=["h1", "h2"])
        old = g[g["side"] == 1][["h1", "h2"]]
        if new.empty or old.empty:
            return new[cols]
        m = new.merge(old.drop_duplicates(), on=["h1", "h2"],
                      how="left", indicator=True)
        return m[m["_merge"] == "left_only"][cols]

    return (left_ds
            .map_batches(tag_new, batch_format="pandas")
            .union(right_hashes_ds.map_batches(
                tag_old, batch_format="pandas"))
            .groupby("hb")
            .map_groups(anti_bucket, batch_format="pandas"))
