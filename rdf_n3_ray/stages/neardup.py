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


def candidate_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """All pairs within each (band, band_hash) LSH bucket.

    Called per COARSE shuffle bucket (band_hash % B); the fine
    (band, band_hash) grouping happens vectorized inside, avoiding
    Ray's per-group UDF overhead on millions of tiny buckets."""
    out_a, out_b = [], []
    for (_, _), g in group.groupby(["band", "band_hash"], sort=False):
        if len(g) < 2:
            continue
        ids = sorted(set(g["doc_id"]))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
    return pd.DataFrame({"a": out_a, "b": out_b})


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard (verification path, small candidate count)."""
    ta, tb = text_a.lower(), text_b.lower()
    A = {ta[i:i + k] for i in range(max(1, len(ta) - k + 1))}
    B = {tb[i:i + k] for i in range(max(1, len(tb) - k + 1))}
    if not A or not B:
        return 0.0
    return len(A & B) / len(A | B)


def minhash_lsh_dedup(
    docs_ds,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    text_col: str = "text",
):
    """Full near-dup pipeline: returns a Dataset of (a, b, sim) verified
    duplicate pairs.  Shuffles: one groupby on (band, band_hash) for
    candidates, one broadcast-side text lookup for verification.

    At 100 TB the verification text lookup would read from the
    partitioned source by doc_id range; here (bench scale) the text map
    is broadcast via ray.put.
    """
    import ray

    sigs = docs_ds.map_batches(
        lambda b: minhash_signatures(b, text_col=text_col, num_perm=num_perm),
        batch_format="pandas",
    ).materialize()  # reused twice: band explosion + signature pre-filter
    band_rows = sigs.map_batches(
        lambda b: explode_bands(b, bands=bands), batch_format="pandas"
    )
    band_rows = band_rows.map_batches(
        lambda b: b.assign(bb=(b["band_hash"] % 64).astype("int32")),
        batch_format="pandas",
    )
    pairs = band_rows.groupby("bb").map_groups(
        candidate_pairs, batch_format="pandas"
    )

    # Global candidate dedup BEFORE verification: the same (a, b) pair
    # surfaces from every band the two docs agree on (and lands in
    # different coarse buckets, so per-batch dedup is not enough — the
    # output would depend on block boundaries).  Then repartition so the
    # verify pool gets real parallelism: the sort-shuffle reduce often
    # emits just a handful of blocks, which would cap the actor pool at
    # that many in-flight tasks.
    from .dedup import dedup_pairs

    pairs = dedup_pairs(pairs, keep_cols=["a", "b"]).repartition(32)

    # Signature pre-filter: estimated Jaccard = fraction of agreeing
    # minhash components (unbiased, sd = sqrt(t(1-t)/num_perm)).  One
    # vectorized gather per batch kills the bulk of the candidate list
    # before the exact-shingle verification; the 2.5-sigma margin keeps
    # recall loss under ~1% of borderline-true pairs.  Signature matrix
    # broadcast once via ray.put (num_docs x num_perm int64).
    sig_df = sigs.to_pandas()
    sig_ids = sig_df["doc_id"].to_numpy()
    order = np.argsort(sig_ids)
    sig_ids = sig_ids[order]
    sig_mat = np.asarray([np.asarray(v) for v in sig_df["signature"]],
                         dtype=np.int64)[order]
    sig_ref = ray.put((sig_ids, sig_mat))
    margin = 2.5 * float(np.sqrt(threshold * (1 - threshold) / num_perm))
    est_cut = max(0.0, threshold - margin)

    def prefilter(batch: pd.DataFrame) -> pd.DataFrame:
        ids, mat = ray.get(sig_ref)
        pa_ = np.searchsorted(ids, batch["a"].to_numpy())
        pb_ = np.searchsorted(ids, batch["b"].to_numpy())
        est = (mat[pa_] == mat[pb_]).mean(axis=1)
        return batch.loc[est >= est_cut, ["a", "b"]]

    pairs = pairs.map_batches(prefilter, batch_format="pandas")

    texts = {
        r["doc_id"]: r[text_col]
        for r in docs_ds.select_columns(["doc_id", text_col]).take_all()
    }
    text_ref = ray.put(texts)

    class VerifyJaccard:
        """Actor-pool verification: shingle-hash arrays for every doc
        are built ONCE per actor in __init__, then each candidate pair
        is an O(|A|+|B|) sorted-array intersection — no Python set
        building per pair."""

        def __init__(self):
            self.tmap = ray.get(text_ref)
            self.sh: dict = {}  # lazy per-doc cache: only docs that
            # actually appear in candidate pairs get shingled (eager
            # init would hash the whole corpus in every actor)

        def _shingles(self, d):
            got = self.sh.get(d)
            if got is None:
                text = self.tmap.get(d, "")
                got = self.sh[d] = (
                    _hash_shingles(pd.Series([text]))[0] if text
                    else np.empty(0, dtype=np.uint64))
            return got

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            sims = np.empty(len(batch), dtype=np.float64)
            for i, (a, b) in enumerate(zip(batch["a"], batch["b"])):
                A = self._shingles(a)
                B = self._shingles(b)
                if not len(A) or not len(B):
                    sims[i] = 0.0
                    continue
                if A.size > B.size:
                    A, B = B, A
                # shingle arrays are sorted-unique (np.unique): binary
                # probe the smaller into the larger — O(|A| log |B|),
                # ~2x faster than intersect1d's sort-of-concatenation
                idx = np.searchsorted(B, A)
                idx[idx == B.size] = B.size - 1
                inter = int((B[idx] == A).sum())
                sims[i] = inter / (A.size + B.size - inter)
            batch = batch.assign(sim=sims)
            return batch[batch["sim"] >= threshold]

    # elastic pool (min 1): a fixed min equal to the session CPU count
    # deadlocks small sessions — the pool reserves every CPU and the
    # upstream groupby tasks starve
    return pairs.map_batches(VerifyJaccard, batch_format="pandas",
                             batch_size=8192, concurrency=(1, 8))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pd.DataFrame, text_col: str = "text", bits: int = 64) -> pd.DataFrame:
    """64-bit SimHash over word features (vectorized bit aggregation)."""
    out_h = []
    for t in batch[text_col].fillna(""):
        words = t.lower().split()
        if not words:
            out_h.append(0)
            continue
        hs = np.array(
            [int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big") for w in set(words)],
            dtype=np.uint64,
        )
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
        key = batch[list(key_cols)].astype(str).agg("\x00".join, axis=1)
        dk = pd.util.hash_pandas_object(key, index=False).astype(np.int64)
        batch = batch.assign(dkb=(dk % 64).astype(np.int32))
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
