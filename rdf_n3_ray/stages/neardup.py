"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — training-data pipeline components (build brief).

Scale shape (ray_guide near-dup pattern): shingle+minhash per batch
(vectorized numpy) -> explode to (band, band_hash, doc_id) rows ->
groupby band bucket (the only shuffle) -> candidate pairs inside each
bucket -> exact Jaccard verify -> min-label connected components.
Buckets are uniform hashes, so the shuffle has no skew; candidate
verification is bounded per bucket.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1


def _hash_shingles(texts: pd.Series, k: int = 5) -> list[np.ndarray]:
    """Character k-shingle 64-bit hashes per doc (vectorized per doc via
    numpy stride tricks over the byte array)."""
    out = []
    for t in texts.fillna(""):
        b = t.lower().encode("utf-8", "ignore")
        if len(b) < k:
            # blake2b, NOT builtin hash(): hash() is randomized per
            # process (PYTHONHASHSEED), which would make signatures for
            # short texts differ across Ray workers and runs
            h = int.from_bytes(
                hashlib.blake2b(b, digest_size=8).digest(), "big") >> 1
            out.append(np.array([h], dtype=np.uint64))
            continue
        arr = np.frombuffer(b, dtype=np.uint8)
        windows = np.lib.stride_tricks.sliding_window_view(arr, k)
        # polynomial rolling hash, vectorized over windows
        weights = np.power(257, np.arange(k, dtype=np.uint64), dtype=np.uint64)
        hashes = (windows.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        out.append(np.unique(hashes))
    return out


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    batch: pd.DataFrame,
    text_col: str = "text",
    num_perm: int = 64,
    shingle_k: int = 5,
) -> pd.DataFrame:
    """MinHash signature per document (num_perm permutations)."""
    a, b = _minhash_params(num_perm)
    sigs = []
    for hashes in _hash_shingles(batch[text_col], k=shingle_k):
        hv = hashes.reshape(-1, 1).astype(np.uint64)
        # (a*x + b) mod p, min over shingles, per permutation
        perm = (hv * a + b) % _MERSENNE
        sigs.append(perm.min(axis=0).astype(np.int64))
    out = pd.DataFrame({"doc_id": batch["doc_id"].values})
    out["signature"] = [s.tolist() for s in sigs]
    return out


def explode_bands(batch: pd.DataFrame, bands: int = 16) -> pd.DataFrame:
    """signature -> (doc_id, band, band_hash) rows; the LSH bucketing key."""
    if len(batch) and bands > 0:
        num_perm = len(batch["signature"].iloc[0])
        if bands > num_perm or num_perm % bands:
            raise ValueError(
                f"bands={bands} must divide num_perm={num_perm}: "
                "r=num_perm//bands rows per band would otherwise drop "
                "signature components or hash empty chunks")
    rows_doc, rows_band, rows_hash = [], [], []
    for doc_id, sig in zip(batch["doc_id"], batch["signature"]):
        sig = np.asarray(sig, dtype=np.int64)
        r = len(sig) // bands
        for band in range(bands):
            chunk = sig[band * r:(band + 1) * r]
            h = int.from_bytes(
                hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "big",
                signed=False,
            ) >> 1
            rows_doc.append(doc_id)
            rows_band.append(band)
            rows_hash.append(h)
    return pd.DataFrame(
        {"doc_id": rows_doc, "band": rows_band, "band_hash": np.array(rows_hash, dtype=np.int64)}
    )


MAX_LSH_BUCKET = 1024  # per-(band, band_hash) member cap, see below


def candidate_pairs(group: pd.DataFrame,
                    max_bucket: int | None = None) -> pd.DataFrame:
    """All pairs within each (band, band_hash) LSH bucket.

    Called per COARSE shuffle bucket (band_hash % B); the fine
    (band, band_hash) grouping happens vectorized inside, avoiding
    Ray's per-group UDF overhead on millions of tiny buckets.

    Pair count is O(|bucket|^2): a degenerate hot bucket (e.g. a
    boilerplate band shared by millions of docs) would explode, so
    buckets above `max_bucket` members are truncated to their
    `max_bucket` smallest doc_ids (deterministic) and the drop is
    logged.  Recall caveat: a pair WELL above the similarity threshold
    collides in many bands and keeps surfacing from other,
    non-degenerate buckets, but a pair NEAR the threshold typically
    collides in only one (per-band collision p ~ sim^r), so capping a
    hot bucket can drop near-threshold pairs for good — the cap trades
    exactness for bounded output and is deliberately a parameter:
    exactness-checked paths run corpora small enough that the cap
    never triggers, and a 100 TB run accepts the logged truncation
    (materializing O(|bucket|^2) pairs is infeasible there anyway)."""
    import logging

    cap = MAX_LSH_BUCKET if max_bucket is None else max_bucket
    g = group[["band", "band_hash", "doc_id"]].drop_duplicates()
    g = g.sort_values(["band", "band_hash", "doc_id"], kind="stable")
    if len(g) < 2:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    band = g["band"].to_numpy()
    bh = g["band_hash"].to_numpy()
    new_grp = np.ones(len(g), dtype=bool)
    new_grp[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    grp_id = np.cumsum(new_grp) - 1
    rank = np.arange(len(g)) - np.nonzero(new_grp)[0][grp_id]
    ids = g["doc_id"].to_numpy()
    if cap:
        sizes_all = np.bincount(grp_id)
        capped_buckets = int(np.count_nonzero(sizes_all > cap))
        if capped_buckets:
            # sorted-by-doc_id order makes "the cap smallest doc_ids"
            # a per-group prefix: rank < cap keeps groups contiguous
            keep = rank < cap
            dropped_docs = int(len(g) - keep.sum())
            grp_id, rank, ids = grp_id[keep], rank[keep], ids[keep]
            logging.getLogger(__name__).warning(
                "candidate_pairs: capped %d hot LSH bucket(s) at %d "
                "members (%d doc slots dropped; pairs for them still "
                "surface from other bands)",
                capped_buckets, cap, dropped_docs)
    # all i<j pairs per group, emitted by array arithmetic: element at
    # in-group rank r is the `a` of (size-1-r) pairs; its partners are
    # the next 1..count elements of the (contiguous, doc_id-sorted)
    # group — no Python loop over buckets or pairs
    sizes = np.bincount(grp_id)
    a_counts = sizes[grp_id] - 1 - rank
    total = int(a_counts.sum())
    if total == 0:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    a_pos = np.repeat(np.arange(len(ids)), a_counts)
    k = (np.arange(total, dtype=np.int64)
         - np.repeat(np.cumsum(a_counts) - a_counts, a_counts))
    b_pos = a_pos + 1 + k
    return pd.DataFrame({"a": ids[a_pos], "b": ids[b_pos]})


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard (verification path, small candidate count)."""
    ta, tb = text_a.lower(), text_b.lower()
    A = {ta[i:i + k] for i in range(max(1, len(ta) - k + 1))}
    B = {tb[i:i + k] for i in range(max(1, len(tb) - k + 1))}
    if not A or not B:
        return 0.0
    return len(A & B) / len(A | B)


def _shingles_cached(cache: dict, doc_id, text, k: int = 5) -> np.ndarray:
    """Lazy per-doc shingle-hash array; non-str/None text counts as ""
    (one whole-text shingle — see the empty-text pair semantics)."""
    got = cache.get(doc_id)
    if got is None:
        got = cache[doc_id] = _hash_shingles(
            pd.Series([text if isinstance(text, str) else ""]), k=k)[0]
    return got


def _probe_jaccard(A: np.ndarray, B: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique hash arrays: binary-probe the
    smaller into the larger — O(|A| log |B|)."""
    if A.size > B.size:
        A, B = B, A
    idx = np.searchsorted(B, A)
    idx[idx == B.size] = B.size - 1
    inter = int((B[idx] == A).sum())
    return inter / (A.size + B.size - inter)


def _verify_pair_group(group: pd.DataFrame, threshold: float,
                       est_cut: float, shingle_k: int = 5) -> pd.DataFrame:
    """Per pair-bucket verification: pivot the two half-rows of each
    candidate pair side-by-side, signature pre-filter (vectorized), then
    exact k-shingle Jaccard with a group-local shingle cache (each doc's
    text is shingled once per bucket, not once per pair)."""
    g0 = group[group["role"] == 0][["a", "b", "signature", "text"]]
    g1 = group[group["role"] == 1][["a", "b", "signature", "text"]]
    m = g0.merge(g1, on=["a", "b"], suffixes=("_a", "_b"))
    if m.empty:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "sim": pd.Series(dtype="float64")})
    sa = np.asarray(m["signature_a"].tolist(), dtype=np.int64)
    sb = np.asarray(m["signature_b"].tolist(), dtype=np.int64)
    est = (sa == sb).mean(axis=1)
    m = m.loc[est >= est_cut]
    cache: dict = {}

    out_a, out_b, out_s = [], [], []
    for a, b, ta, tb in zip(m["a"], m["b"], m["text_a"], m["text_b"]):
        A = _shingles_cached(cache, a, ta, k=shingle_k)
        B = _shingles_cached(cache, b, tb, k=shingle_k)
        sim = _probe_jaccard(A, B)
        if sim >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_s.append(sim)
    return pd.DataFrame({"a": np.array(out_a, dtype=np.int64),
                         "b": np.array(out_b, dtype=np.int64),
                         "sim": np.array(out_s, dtype=np.float64)})


_EMPTY_PAIRS = {"a": "int64", "b": "int64", "sim": "float64"}


def _empty_pairs_df() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=t)
                         for c, t in _EMPTY_PAIRS.items()})


def _verify_rows(pairs_df: pd.DataFrame, texts: dict, threshold: float,
                 shingle_k: int, cache: dict) -> pd.DataFrame:
    """Exact k-shingle Jaccard over candidate rows with a lazy per-doc
    shingle cache; keeps pairs at/above threshold."""
    out_a, out_b, out_s = [], [], []
    for a, bb_ in zip(pairs_df["a"], pairs_df["b"]):
        A = _shingles_cached(cache, a, texts.get(a, ""), k=shingle_k)
        B = _shingles_cached(cache, bb_, texts.get(bb_, ""), k=shingle_k)
        sim = _probe_jaccard(A, B)
        if sim >= threshold:
            out_a.append(a)
            out_b.append(bb_)
            out_s.append(sim)
    return pd.DataFrame({"a": np.array(out_a, dtype=np.int64),
                         "b": np.array(out_b, dtype=np.int64),
                         "sim": np.array(out_s, dtype=np.float64)})


def _lsh_small_corpus(info, bands: int, threshold: float, est_cut: float,
                      max_bucket, shingle_k: int = 5,
                      driver_verify_limit: int = 4096):
    """Small-corpus LSH tail: the caller's MEASURED size gate
    guarantees (doc_id, signature, text) fits the driver, so band
    explosion, bucket grouping, candidate emission (candidate_pairs is
    fully vectorized) and the signature pre-filter all run driver-side
    with ZERO shuffles; exact shingle verification runs on the driver
    up to `driver_verify_limit` candidates and in an elastic actor
    pool (texts ray.put once) above it.  The signature pass — the
    per-doc compute that dominates at corpus scale — already ran
    distributed; everything here is bounded by the gate."""
    import ray
    import ray.data as rd

    info_df = info.to_pandas()
    band_df = explode_bands(info_df[["doc_id", "signature"]], bands=bands)
    pairs = candidate_pairs(band_df, max_bucket=max_bucket) \
        .drop_duplicates(subset=["a", "b"])
    if pairs.empty:
        return rd.from_pandas(_empty_pairs_df())
    order = np.argsort(info_df["doc_id"].to_numpy())
    sig_ids = info_df["doc_id"].to_numpy(dtype=np.int64)[order]
    sig_mat = np.asarray(info_df["signature"].tolist(),
                         dtype=np.int64)[order]
    pa_ = np.searchsorted(sig_ids, pairs["a"].to_numpy(dtype=np.int64))
    pb_ = np.searchsorted(sig_ids, pairs["b"].to_numpy(dtype=np.int64))
    est = (sig_mat[pa_] == sig_mat[pb_]).mean(axis=1)
    pairs = pairs.loc[est >= est_cut, ["a", "b"]]
    if pairs.empty:
        return rd.from_pandas(_empty_pairs_df())
    texts = dict(zip(info_df["doc_id"].astype(np.int64), info_df["text"]))

    if len(pairs) <= driver_verify_limit:
        return rd.from_pandas(
            _verify_rows(pairs, texts, threshold, shingle_k, {}))

    text_ref = ray.put(texts)

    class Verify:
        def __init__(self):
            self.tmap = ray.get(text_ref)
            self.cache: dict = {}

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            return _verify_rows(b, self.tmap, threshold, shingle_k,
                                self.cache)

    from .ann import _elastic_pool

    return (rd.from_pandas(pairs.reset_index(drop=True))
            .repartition(16)
            .map_batches(Verify, batch_format="pandas",
                         batch_size=8192, concurrency=_elastic_pool()))


def minhash_lsh_dedup(
    docs_ds,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    text_col: str = "text",
    num_buckets: int = 64,
    prefilter_sigma: float | None = 2.5,
    broadcast_limit: int = 100_000,
    max_bucket: int | None = None,
):
    """Full near-dup pipeline: returns a Dataset of (a, b, sim) verified
    duplicate pairs.

    Two verification paths, chosen by MEASURED corpus size (same
    small-side-fast-path convention as the reasoner's _join_seq):

    - corpus <= `broadcast_limit` docs: signatures+texts broadcast once
      via ray.put, candidate pairs verified by an actor pool — one
      groupby shuffle total (the known bound keeps the broadcast safe).
    - larger: fully distributed, nothing corpus-sized on the driver:
      1. band explosion -> groupby(band-hash bucket) -> candidates
      2. endpoint co-group: pair halves (keyed by a / by b) shuffled
         together with the per-doc (signature, text) rows on
         doc_id % num_buckets; vectorized in-bucket merge (also dedups
         duplicate candidates for free)
      3. pair regroup on (a, b) bucket: signature pre-filter + exact
         k-shingle Jaccard verify inside the group

    `prefilter_sigma`: the pre-filter keeps pairs whose estimated
    Jaccard (fraction of agreeing minhash components, unbiased,
    sd = sqrt(t(1-t)/num_perm)) is >= threshold - sigma*sd.  RECALL
    BOUND: a true pair at exactly `threshold` is dropped with
    probability ~Phi(-sigma) (~0.6% at the default 2.5); pass None to
    disable the pre-filter and verify every LSH candidate exactly.

    `max_bucket`: per-(band, band_hash) candidate-bucket member cap
    (None -> candidate_pairs' MAX_LSH_BUCKET default).  Capping bounds
    the O(|bucket|^2) pair blowup on boilerplate-heavy corpora but can
    drop near-threshold pairs whose only band collision is the hot
    bucket — see candidate_pairs.  Exactness-oracle paths rely on the
    cap never triggering at their corpus size.
    """
    def sig_and_text(b: pd.DataFrame) -> pd.DataFrame:
        out = minhash_signatures(b, text_col=text_col, num_perm=num_perm)
        out["text"] = b[text_col].fillna("").values
        return out

    # one shingling pass; reused by band explosion AND verification
    info = docs_ds.map_batches(sig_and_text,
                               batch_format="pandas").materialize()

    if prefilter_sigma is None:
        est_cut = 0.0
    else:
        margin = prefilter_sigma * float(
            np.sqrt(threshold * (1 - threshold) / num_perm))
        est_cut = max(0.0, threshold - margin)

    if info.count() <= broadcast_limit:
        # gated small corpus: the whole LSH tail runs driver-side with
        # zero shuffles (only the signature pass above is distributed)
        return _lsh_small_corpus(info, bands, threshold, est_cut,
                                 max_bucket)

    band_rows = info.map_batches(
        lambda b: explode_bands(b[["doc_id", "signature"]], bands=bands),
        batch_format="pandas",
    )
    band_rows = band_rows.map_batches(
        lambda b: b.assign(bb=(b["band_hash"] % 64).astype("int32")),
        batch_format="pandas",
    )
    pairs = band_rows.groupby("bb").map_groups(
        lambda g: candidate_pairs(g, max_bucket=max_bucket),
        batch_format="pandas",
    )
    # NB: `pairs` still contains global duplicates (the same (a, b)
    # surfaces from every band the two docs agree on).  All copies of
    # a half-row are identical and land in the same endpoint bucket, so
    # `attach` dedups them for free — no dedicated dedup shuffle.

    # --- endpoint co-group: attach (signature, text) to each pair half.
    # Union schema (explicit Arrow types so both sides unify): [eb, role,
    # doc_id, a, b, signature, text]; info rows have role=-1, half rows
    # carry their endpoint in doc_id and null signature/text.
    import pyarrow as pa

    _SIG_T = pa.list_(pa.int64())

    def tag_info(b: pd.DataFrame) -> pa.Table:
        ids = b["doc_id"].to_numpy(dtype=np.int64, copy=False)
        n = len(b)
        return pa.table({
            "eb": pa.array((ids % num_buckets).astype(np.int32), pa.int32()),
            "role": pa.array(np.full(n, -1, np.int8), pa.int8()),
            "doc_id": pa.array(ids, pa.int64()),
            "a": pa.array(np.full(n, -1, np.int64), pa.int64()),
            "b": pa.array(np.full(n, -1, np.int64), pa.int64()),
            "signature": pa.array(b["signature"].tolist(), _SIG_T),
            # fillna BEFORE str conversion: astype(str) on NaN would
            # ship the literal string "nan" into the verify stage
            "text": pa.array(b["text"].fillna("").astype(str).tolist(),
                             pa.string()),
        })

    def tag_halves(b: pd.DataFrame) -> pa.Table:
        halves = []
        a = b["a"].to_numpy(dtype=np.int64, copy=False)
        bb_ = b["b"].to_numpy(dtype=np.int64, copy=False)
        n = len(b)
        for role, ep in ((0, a), (1, bb_)):
            halves.append(pa.table({
                "eb": pa.array((ep % num_buckets).astype(np.int32), pa.int32()),
                "role": pa.array(np.full(n, role, np.int8), pa.int8()),
                "doc_id": pa.array(ep, pa.int64()),
                "a": pa.array(a, pa.int64()),
                "b": pa.array(bb_, pa.int64()),
                "signature": pa.nulls(n, _SIG_T),
                "text": pa.nulls(n, pa.string()),
            }))
        return pa.concat_tables(halves)

    tagged = info.map_batches(tag_info, batch_format="pandas").union(
        pairs.map_batches(tag_halves, batch_format="pandas"))

    def attach(group: pd.DataFrame) -> pa.Table:
        docs = group[group["role"] == -1][["doc_id", "signature", "text"]]
        need = group[group["role"] != -1][["role", "doc_id", "a", "b"]]
        # global pair dedup happens HERE: every copy of a half-row is
        # identical and hashes to this same endpoint bucket
        need = need.drop_duplicates()
        got = need.merge(docs, on="doc_id", how="inner")
        # explicit Arrow types: an empty group must not emit null-typed
        # columns (they would clash with list<int64>/string blocks in
        # the pair-bucket shuffle)
        return pa.table({
            "role": pa.array(got["role"].to_numpy(dtype=np.int8), pa.int8()),
            "a": pa.array(got["a"].to_numpy(dtype=np.int64), pa.int64()),
            "b": pa.array(got["b"].to_numpy(dtype=np.int64), pa.int64()),
            "signature": pa.array(got["signature"].tolist(), _SIG_T),
            "text": pa.array(got["text"].tolist(), pa.string()),
        })

    halves = tagged.groupby("eb").map_groups(attach, batch_format="pandas")

    # --- pair regroup + verify
    def pair_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(pb=((b["a"] * 1_000_003 + b["b"])
                            % num_buckets).astype("int32"))

    return (halves.map_batches(pair_bucket, batch_format="pandas")
            .groupby("pb")
            .map_groups(lambda g: _verify_pair_group(g, threshold, est_cut),
                        batch_format="pandas"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_MASK64 = (1 << 64) - 1
# two odd 32-bit Knuth multiplicative constants: each multiply mod 2^64
# is a bijection; chaining two spreads low-order input bits across the
# word.  32-bit constants keep every intermediate below 2^96, so the
# identical recipe runs in DuckDB HUGEINT arithmetic without overflow.
_MIX1 = 2654435769   # 0x9E3779B9
_MIX2 = 3266489917   # 0xC2B2AE35


def _word_hash64(w: str) -> int:
    """Base-257 code-point polynomial + double multiplicative mix, mod
    2^64.  Chosen over a crypto hash because it is exactly reproducible
    in DuckDB SQL (list_reduce over unicode code points), which gives
    the simhash oracle bit-identical values."""
    h = 0
    for ch in w:
        h = (h * 257 + ord(ch)) & _MASK64
    h = (h * _MIX1) & _MASK64
    return (h * _MIX2) & _MASK64


def simhash_batch(batch: pd.DataFrame, text_col: str = "text", bits: int = 64) -> pd.DataFrame:
    """64-bit SimHash over distinct-word features (vectorized bit
    aggregation; per-batch word-hash cache).  Output keeps hash bits
    1..63 (>>1) to stay in int64."""
    cache: dict[str, int] = {}
    out_h = []
    for t in batch[text_col].fillna(""):
        words = set(t.lower().split())
        if not words:
            out_h.append(0)
            continue
        hs = np.empty(len(words), dtype=np.uint64)
        for i, w in enumerate(words):
            h = cache.get(w)
            if h is None:
                h = cache[w] = _word_hash64(w)
            hs[i] = h
        bit_matrix = ((hs[:, None] >> np.arange(bits, dtype=np.uint64)) & 1).astype(np.int32)
        v = bit_matrix.sum(axis=0) * 2 - len(hs)
        sim = np.uint64(0)
        for i in np.nonzero(v > 0)[0]:
            sim |= np.uint64(1) << np.uint64(i)
        out_h.append(int(sim >> np.uint64(1)))  # keep in int64 range
    out = batch[["doc_id"]].copy()
    out["simhash"] = np.array(out_h, dtype=np.int64)
    return out


def exact_dedup_docs(docs_ds, key_cols=("text",)):
    """Exact dedup on content hash: combiner + groupby(hash).first —
    returns the surviving rows (min doc_id wins, deterministic)."""
    def add_key(batch: pd.DataFrame) -> pd.DataFrame:
        from .keys import bucket64

        batch = batch.assign(dkb=bucket64(
            64, *[batch[c].astype(str) for c in key_cols]))
        return batch.sort_values("doc_id").drop_duplicates(
            subset=list(key_cols), keep="first")

    # coarse-bucket shuffle (hash only buckets — the dedup itself
    # compares the FULL key columns, so a 64-bit hash collision can
    # never merge two distinct documents) + vectorized in-bucket dedup
    keyed = docs_ds.map_batches(add_key, batch_format="pandas")
    out = keyed.groupby("dkb").map_groups(
        lambda g: g.sort_values("doc_id").drop_duplicates(
            subset=list(key_cols), keep="first"),
        batch_format="pandas",
    )
    return out.drop_columns(["dkb"])


# ---------------------------------------------------------------------------
# SimHash near-dup pairs: Hamming-ball search over the 63-bit SimHash
# via band buckets.  The fingerprint is split into four 16/16/16/15-bit
# bands; any pair within Hamming distance d <= 3 shares at least one
# identical band (pigeonhole over 4 bands), so bucketing on (band_idx,
# band_value) + an EXACT popcount verify inside the bucket finds the
# complete <=d pair set — same structure as MinHash LSH but with a
# deterministic (not probabilistic) recall guarantee.  One shuffle for
# the band buckets, one endpoint-bucket shuffle to dedup pairs that
# collide in several bands; pair emission is the same array-arithmetic
# prefix trick as candidate_pairs (no Python loop over buckets).
# ---------------------------------------------------------------------------

_POP16 = None


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy < 2 has no bitwise_count):
    four 16-bit table lookups."""
    global _POP16
    if _POP16 is None:
        _POP16 = np.unpackbits(
            np.arange(1 << 16, dtype=">u2").view(np.uint8)).reshape(
            1 << 16, 16).sum(axis=1).astype(np.uint8)
    v = x.astype(np.uint64)
    r = _POP16[(v & np.uint64(0xFFFF)).astype(np.int64)].astype(np.int64)
    for s in (16, 32, 48):
        r = r + _POP16[((v >> np.uint64(s)) & np.uint64(0xFFFF))
                       .astype(np.int64)]
    return r


def simhash_band_rows(batch: pd.DataFrame,
                      num_partitions: int = 64) -> pd.DataFrame:
    """(doc_id, simhash) -> four (key, doc_id, simhash) band rows with
    key = band_idx << 17 | 16-bit band value."""
    h = batch["simhash"].to_numpy().astype(np.int64)
    ids = batch["doc_id"].to_numpy().astype(np.int64)
    outs = []
    for i in range(4):
        bv = (h >> (16 * i)) & np.int64(0xFFFF)
        outs.append(pd.DataFrame({
            "key": (np.int64(i) << 17) | bv,
            "doc_id": ids, "simhash": h}))
    g = pd.concat(outs, ignore_index=True)
    g["jb"] = (g["key"] % num_partitions).astype("int32")
    return g


def simhash_bucket_pairs(group: pd.DataFrame, max_ham: int,
                         max_bucket: int | None = None) -> pd.DataFrame:
    """All exact-verified Hamming<=max_ham pairs inside each band
    bucket of one coarse shuffle group.  Hot buckets above
    `max_bucket` members are truncated to their smallest doc_ids with
    a logged drop (same trade as candidate_pairs — exactness-checked
    corpora never trigger it)."""
    import logging

    cap = MAX_LSH_BUCKET if max_bucket is None else max_bucket
    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "hamming": pd.Series(dtype="int64")})
    g = group[["key", "doc_id", "simhash"]].drop_duplicates(
        ["key", "doc_id"]).sort_values(["key", "doc_id"], kind="stable")
    if len(g) < 2:
        return empty
    key = g["key"].to_numpy()
    new_grp = np.ones(len(g), dtype=bool)
    new_grp[1:] = key[1:] != key[:-1]
    grp_id = np.cumsum(new_grp) - 1
    rank = np.arange(len(g)) - np.nonzero(new_grp)[0][grp_id]
    ids = g["doc_id"].to_numpy()
    hs = g["simhash"].to_numpy()
    if cap:
        sizes_all = np.bincount(grp_id)
        capped = int(np.count_nonzero(sizes_all > cap))
        if capped:
            keep = rank < cap
            logging.getLogger(__name__).warning(
                "simhash_bucket_pairs: capped %d hot band bucket(s) "
                "at %d members (%d doc slots dropped)",
                capped, cap, int(len(g) - keep.sum()))
            grp_id, rank = grp_id[keep], rank[keep]
            ids, hs = ids[keep], hs[keep]
    sizes = np.bincount(grp_id)
    a_counts = sizes[grp_id] - 1 - rank
    total = int(a_counts.sum())
    if total == 0:
        return empty
    a_pos = np.repeat(np.arange(len(ids)), a_counts)
    k = (np.arange(total, dtype=np.int64)
         - np.repeat(np.cumsum(a_counts) - a_counts, a_counts))
    b_pos = a_pos + 1 + k
    ham = _popcount64(np.bitwise_xor(hs[a_pos], hs[b_pos]))
    m = ham <= max_ham
    out = pd.DataFrame({"a": ids[a_pos][m], "b": ids[b_pos][m],
                        "hamming": ham[m].astype("int64")})
    # a<b normalization: ids are doc_id-sorted within the bucket
    return out.drop_duplicates(["a", "b"])


def simhash_pairs_dataset(docs, max_ham: int = 1,
                          num_partitions: int = 64,
                          max_bucket: int = 8192):
    """documents Dataset -> Dataset of (a, b, hamming), the COMPLETE
    set of doc pairs with SimHash Hamming distance <= max_ham
    (requires max_ham <= 3 for the 4-band recall guarantee).

    max_bucket defaults higher than the LSH cap (8192: ~33M popcounts
    per hot bucket, ~0.3s vectorized) because a capped bucket here
    breaks the COMPLETE-recall claim, not just approximate recall —
    the truncation is still logged if a boilerplate-degenerate corpus
    exceeds it."""
    if max_ham > 3:
        raise ValueError("4-band bucketing guarantees recall only for "
                         "max_ham <= 3")
    sh = docs.map_batches(simhash_batch, batch_format="pandas")
    bands = sh.map_batches(
        lambda b: simhash_band_rows(b, num_partitions),
        batch_format="pandas")
    pairs = bands.groupby("jb").map_groups(
        lambda g: simhash_bucket_pairs(g, max_ham, max_bucket),
        batch_format="pandas")

    # cross-band dedup on an endpoint bucket (a pair can surface from
    # up to 4 bands); all copies of (a, b) share `a`, so they co-locate
    def dedup(group: pd.DataFrame) -> pd.DataFrame:
        return group[["a", "b", "hamming"]].drop_duplicates(["a", "b"])

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        if "a" not in b.columns:  # all-empty upstream block lost schema
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "hamming": pd.Series(dtype="int64"),
                                 "jb": pd.Series(dtype="int32")})
        b = b.copy()
        b["jb"] = (b["a"] % num_partitions).astype("int32")
        return b

    return (pairs.map_batches(tag, batch_format="pandas")
            .groupby("jb").map_groups(dedup, batch_format="pandas")
            .sort(["a", "b"]))
