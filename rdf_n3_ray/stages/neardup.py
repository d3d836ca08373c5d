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
            out.append(np.array([hash(b) & 0x7FFFFFFFFFFFFFFF], dtype=np.uint64))
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
    )
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
    texts = {
        r["doc_id"]: r[text_col]
        for r in docs_ds.select_columns(["doc_id", text_col]).take_all()
    }
    text_ref = ray.put(texts)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        tmap = ray.get(text_ref)
        batch = batch.drop_duplicates(subset=["a", "b"])
        sims = [
            jaccard(tmap.get(a, ""), tmap.get(b, ""))
            for a, b in zip(batch["a"], batch["b"])
        ]
        batch = batch.assign(sim=sims)
        return batch[batch["sim"] >= threshold]

    return pairs.map_batches(verify, batch_format="pandas")


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
        batch = batch.assign(dk=dk, dkb=(dk % 64).astype(np.int32))
        return batch.sort_values("doc_id").drop_duplicates(subset=["dk"], keep="first")

    # coarse-bucket shuffle + vectorized within-bucket dedup (see
    # stages/dedup.py group_dedup for why fine keys are pathological)
    keyed = docs_ds.map_batches(add_key, batch_format="pandas")
    out = keyed.groupby("dkb").map_groups(
        lambda g: g.sort_values("doc_id").drop_duplicates(subset=["dk"], keep="first"),
        batch_format="pandas",
    )
    return out.drop_columns(["dk", "dkb"])
