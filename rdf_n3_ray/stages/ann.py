"""Similarity search over an embedding column (`list<float>`).

- Brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (`ray.put` once; batches stream) — the exactness
  baseline, O(N·Q·D) but perfectly parallel and shuffle-free.
- LSH-bucketed variant (random hyperplane signs): signature per row ->
  groupby(bucket) — the 100 TB scale path, probing only matching
  buckets.

Embeddings table: (vec_id:int64, embedding:list<float>, label:int32).
"""
from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

from .rounding import round_half_away


def _matrix(col, dtype=np.float32) -> np.ndarray:
    """(N, D) matrix from an embedding column.  An Arrow
    list/fixed_size_list array goes flatten() -> to_numpy() -> reshape
    (zero-copy off the object store but for the final dtype cast);
    any other sequence-of-vectors falls back to a Python-level build.
    Null rows and ragged lengths are rejected (the embedding contract
    is equal-length non-null vectors; flatten() would silently
    misalign them otherwise)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array) and (
            pa.types.is_list(col.type) or pa.types.is_large_list(col.type)
            or pa.types.is_fixed_size_list(col.type)):
        n = len(col)
        if n == 0:
            return np.empty((0, 0), dtype=dtype)
        # flatten() silently DROPS null entries, which would shift every
        # following vector into the wrong row — reject instead of
        # corrupting similarities.
        if col.null_count:
            raise ValueError(
                f"_matrix: {col.null_count} null embedding row(s); "
                "embeddings must be non-null")
        if not pa.types.is_fixed_size_list(col.type):
            import pyarrow.compute as pc

            mm = pc.min_max(pc.list_value_length(col))
            if mm["min"].as_py() != mm["max"].as_py():
                raise ValueError(
                    "_matrix: ragged embedding lengths "
                    f"({mm['min']}..{mm['max']}); vectors must be "
                    "equal-length")
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(n, -1).astype(dtype, copy=False)
    return np.asarray([np.asarray(v, dtype=dtype) for v in col], dtype=dtype)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms



def _elastic_pool() -> tuple:
    """Elastic actor-pool bound: (1, cluster CPUs).  A fixed small cap
    starves the only expensive stage at scale (the round-3 LangId
    lesson); results are pool-size-invariant (pure per-batch partials),
    so sizing to the cluster is free."""
    import ray

    try:
        n = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        n = 8
    return (1, max(2, n))


class BruteForceTopK:
    """Actor-pool stage: per-batch partial top-k against the broadcast
    query matrix; partials merged on the driver (tiny: Q×k rows)."""

    def __init__(self, query_ref=None, queries: np.ndarray | None = None, k: int = 10,
                 dtype=np.float32):
        if queries is None:
            import ray

            queries = ray.get(query_ref)
        self.dtype = dtype
        self.q = _normalize(np.asarray(queries, dtype=dtype))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        emb = _normalize(_matrix(batch.column("embedding"), self.dtype))
        sims = emb @ self.q.T  # (N, Q)
        k = min(self.k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.q.shape[0]):
            col = sims[:, qi]
            # lexicographic (-sim, vec_id) selection: plain argpartition
            # keeps an arbitrary subset of ties, which could discard the
            # smallest vec_ids before the driver merge applies the
            # documented sim DESC, vec_id ASC tie-break
            order = np.lexsort((ids, -col))[:k]
            for i in order:
                out_q.append(qi)
                out_id.append(int(ids[i]))
                out_sim.append(float(col[i]))
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_sim, pa.float64()),
            }
        )


def _merge_topk(partials_ds, k: int) -> pd.DataFrame:
    """Driver-side merge of per-batch partial top-k tables.  Only Q×k
    rows per upstream batch ever reach the driver — the merge state is
    Q heaps of k entries, independent of dataset size.  Ties broken by
    smaller vec_id (stable, matches a SQL row_number oracle ordered by
    sim DESC, vec_id ASC)."""
    best: dict[int, list] = {}
    for batch in partials_ds.iter_batches(batch_format="pandas"):
        for qi, vid, sim in zip(batch["query_idx"], batch["vec_id"], batch["sim"]):
            heap = best.setdefault(int(qi), [])
            item = (float(sim), -int(vid))
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
    rows = []
    for qi, heap in sorted(best.items()):
        for sim, nvid in sorted(heap, reverse=True):
            rows.append({"query_idx": qi, "vec_id": -nvid, "sim": sim})
    return pd.DataFrame(rows, columns=["query_idx", "vec_id", "sim"])


def brute_force_topk(embeddings_ds, queries: np.ndarray, k: int = 10, concurrency=None,
                     dtype=np.float32):
    """Distributed exact top-k: map (partial per batch) + driver merge.

    The query matrix ships in the actor constructor spec (small); a
    ray.put ref as a constructor arg can outlive its owner and wedge
    actor restarts (ray issue #53727 — see stages/linker.py)."""
    partials = embeddings_ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries": np.asarray(queries, dtype=dtype),
                               "k": k, "dtype": dtype},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency or _elastic_pool(),
    )
    return _merge_topk(partials, k)


class MaskedTopK:
    """Actor-pool stage for probe-based ANN: vectorized partition filter
    (pc.is_in on the cluster/bucket column — no per-row Python filter)
    followed by per-query masked partial top-k.  Each query scores only
    rows in its OWN probed partitions (np.isin mask), so IVF/LSH probe
    semantics are identical across the in-memory and persisted paths.
    Partials are Q×k rows per batch; the driver merge is _merge_topk."""

    def __init__(self, queries: np.ndarray, q_allowed, part_col: str,
                 k: int, dtype=np.float64):
        self.dtype = dtype
        self.q = _normalize(np.asarray(queries, dtype=dtype))
        self.q_allowed = [np.asarray(a, dtype=np.int64) for a in q_allowed]
        wanted = sorted({int(c) for a in self.q_allowed for c in a})
        self.wanted = pa.array(wanted, pa.int64())
        self.part_col = part_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column(self.part_col).cast(pa.int64())
        batch = batch.filter(pc.is_in(col, value_set=self.wanted))
        empty = pa.table({"query_idx": pa.array([], pa.int32()),
                          "vec_id": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        parts = (batch.column(self.part_col).cast(pa.int64())
                 .to_numpy(zero_copy_only=False))
        emb = _normalize(_matrix(batch.column("embedding"), self.dtype))
        sims = emb @ self.q.T  # (N, Q)
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.q.shape[0]):
            mask = np.isin(parts, self.q_allowed[qi])
            if not mask.any():
                continue
            col_s = sims[mask, qi]
            mids = ids[mask]
            kk = min(self.k, len(mids))
            # lexicographic (-sim, vec_id): ties keep smallest vec_ids
            # (see BruteForceTopK)
            order = np.lexsort((mids, -col_s))[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(int(v) for v in mids[order])
            out_sim.extend(float(s) for s in col_s[order])
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_sim, pa.float64()),
            }
        )


def _kmeans(sample: np.ndarray, n_clusters: int, iters: int = 8,
            seed: int = 5) -> np.ndarray:
    """Tiny deterministic k-means on a driver-side sample (spherical:
    rows and centroids L2-normalized; assignment by max cosine)."""
    rng = np.random.default_rng(seed)
    sample = _normalize(sample.astype(np.float64))
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)),
                     replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_build(embeddings_ds, n_clusters: int = 16, sample_size: int = 2048,
              seed: int = 5):
    """IVF index build: centroids from a driver-side sample, then a
    streaming assignment pass adds a `cluster` column (centroids
    broadcast in task args — shipped once per task spec, not per batch).
    At 100 TB the assigned dataset is written partitioned by `cluster`
    so probes read only matching partitions."""
    # materialize: count, the centroid sample and the assignment pass
    # all consume this dataset — one read instead of three
    embeddings_ds = embeddings_ds.materialize()
    frac = None
    try:
        n = embeddings_ds.count()
        frac = min(1.0, sample_size / max(n, 1))
    except Exception:
        frac = 1.0
    sample = embeddings_ds.random_sample(frac, seed=seed) if frac < 1.0 \
        else embeddings_ds
    mat = _matrix([r["embedding"] for r in sample.take(sample_size)])
    cent = _kmeans(mat, n_clusters, seed=seed)

    def assign(batch: pa.Table) -> pa.Table:
        emb = _normalize(_matrix(batch.column("embedding"))
                         .astype(np.float64))
        cl = np.argmax(emb @ cent.T, axis=1).astype(np.int32)
        return batch.append_column("cluster", pa.array(cl, pa.int32()))

    assigned = embeddings_ds.map_batches(assign, batch_format="pyarrow")
    return assigned, cent


def ivf_topk(embeddings_ds, queries: np.ndarray, k: int = 10,
             n_clusters: int = 16, nprobe: int = 4, seed: int = 5):
    """IVF ANN: score only rows whose cluster is among each query's
    `nprobe` nearest centroids. Exact within probed clusters; recall
    grows with nprobe (nprobe == n_clusters -> brute force)."""
    assigned, cent = ivf_build(embeddings_ds, n_clusters=n_clusters,
                               seed=seed)
    qn = np.asarray(queries, dtype=np.float64)
    q_probe = np.argsort(-(_normalize(qn) @ cent.T), axis=1)[:, :nprobe]

    partials = assigned.map_batches(
        MaskedTopK,
        fn_constructor_kwargs={"queries": qn, "q_allowed": list(q_probe),
                               "part_col": "cluster", "k": k,
                               "dtype": np.float64},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=_elastic_pool(),
    )
    return _merge_topk(partials, k)


def lsh_bucket_signatures(batch: pa.Table, planes: np.ndarray) -> pa.Table:
    """Random-hyperplane LSH bucket id per row (sign bits packed)."""
    emb = _matrix(batch.column("embedding"))
    signs = (emb @ planes.T) > 0  # (N, P)
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    buckets = (signs.astype(np.int64) * weights).sum(axis=1)
    return pa.table(
        {
            "vec_id": batch.column("vec_id"),
            "bucket": pa.array(buckets, pa.int64()),
            "embedding": batch.column("embedding"),
        }
    )


def lsh_topk(embeddings_ds, queries: np.ndarray, k: int = 10, n_planes: int = 8, dim: int | None = None, seed: int = 11):
    """ANN via LSH buckets: only rows whose bucket matches a query's
    bucket are scored.  Recall < 1; the scale path for 100 TB (bucket =
    partition key; per-bucket files probed directly)."""
    queries = np.asarray(queries, dtype=np.float32)
    dim = dim or queries.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).astype(np.float32)
    q_signs = (queries @ planes.T) > 0
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    q_buckets = (q_signs.astype(np.int64) * weights).sum(axis=1)

    bucketed = embeddings_ds.map_batches(
        lambda b: lsh_bucket_signatures(b, planes), batch_format="pyarrow"
    )
    partials = bucketed.map_batches(
        MaskedTopK,
        fn_constructor_kwargs={"queries": queries,
                               "q_allowed": [[int(b)] for b in q_buckets],
                               "part_col": "bucket", "k": k,
                               "dtype": np.float32},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=_elastic_pool(),
    )
    return _merge_topk(partials, k)


def ivf_write(embeddings_ds, out_dir: str, n_clusters: int = 16,
              seed: int = 5):
    """Persist an IVF index: cluster-partitioned Parquet + centroids.

    This is the 100 TB layout: `out_dir/cluster=K/*.parquet` per
    centroid, so a probe reads ONLY the matching partitions from
    storage (partition pruning at the read, no full scan)."""
    import json
    import os

    assigned, cent = ivf_build(embeddings_ds, n_clusters=n_clusters,
                               seed=seed)
    # hive partitioning strips the partition column from the data files;
    # persist a duplicate `cluster_id` IN the data so the query path can
    # apply the same per-query probe mask as ivf_topk
    assigned = assigned.map_batches(
        lambda b: b.append_column("cluster_id", b.column("cluster")),
        batch_format="pyarrow",
    )
    assigned.write_parquet(out_dir, partition_cols=["cluster"])
    with open(os.path.join(out_dir, "_centroids.json"), "w") as f:
        json.dump(cent.tolist(), f)
    return cent


def ivf_query(out_dir: str, queries: np.ndarray, k: int = 10,
              nprobe: int = 4):
    """ANN over a persisted IVF index: load centroids, read only the
    `nprobe` matching cluster partitions, brute-force within them."""
    import json
    import os

    import ray.data as rd

    with open(os.path.join(out_dir, "_centroids.json")) as f:
        cent = np.asarray(json.load(f), dtype=np.float64)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    wanted = sorted({int(c) for row in q_probe for c in row})

    # partition-pruned read: only cluster=K directories for probed K
    import glob as _glob

    paths = []
    for c in wanted:
        paths.extend(sorted(_glob.glob(
            os.path.join(out_dir, f"cluster={c}", "*.parquet"))))
    if not paths:
        return pd.DataFrame(columns=["query_idx", "vec_id", "sim"])

    # index format v2 persists a `cluster_id` data column (ivf_write);
    # v1 indexes (pre-bump) lack it — detect from the file schema and
    # fall back to scoring every row of the probed partitions per query
    # (the old, slightly-wider union-of-probes semantics) instead of
    # failing the read
    import pyarrow.parquet as pq

    has_cluster_id = "cluster_id" in pq.read_schema(paths[0]).names
    cols = ["vec_id", "embedding"] + (
        ["cluster_id"] if has_cluster_id else [])
    probed = rd.read_parquet(paths, columns=cols).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow")

    if not has_cluster_id:
        partials = probed.map_batches(
            BruteForceTopK,
            fn_constructor_kwargs={"queries": qn, "k": k,
                                   "dtype": np.float64},
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=_elastic_pool(),
        )
        return _merge_topk(partials, k)

    # same per-query probe mask as ivf_topk (the persisted cluster_id
    # column restores the cluster of every row): each query scores only
    # rows of its OWN nprobe clusters, not the union of all probed ones
    partials = probed.map_batches(
        MaskedTopK,
        fn_constructor_kwargs={"queries": qn, "q_allowed": list(q_probe),
                               "part_col": "cluster_id", "k": k,
                               "dtype": np.float64},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=_elastic_pool(),
    )
    return _merge_topk(partials, k)


# ---------------------------------------------------------------------------
# Product quantization (PQ): the 100 TB memory path for ANN
# ---------------------------------------------------------------------------

def pq_train(embeddings_ds, m: int = 8, ks: int = 16,
             sample_size: int = 2048, iters: int = 8, seed: int = 5):
    """Train per-subspace codebooks (Jegou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011) on a
    driver-side sample: split the (L2-normalized) vector into `m`
    contiguous subvectors and k-means each subspace independently.
    Returns codebooks of shape (m, ks, dim // m).

    The codebooks are tiny (m * ks * dsub floats — kilobytes) and
    broadcast in task args; the corpus itself is only ever touched by
    the streaming encode pass (`pq_encode`) — no materialize here:
    count() on a Parquet source is metadata-only, the sample pass
    streams, and the encode pass re-reads from storage, so the float
    corpus (the thing PQ exists to not hold) never pins in the object
    store."""
    if not 0 < ks <= 256:
        raise ValueError(f"ks={ks} must fit a uint8 code (1..256)")
    try:
        n = embeddings_ds.count()
        frac = min(1.0, sample_size / max(n, 1))
    except Exception:
        frac = 1.0
    sample = embeddings_ds.random_sample(frac, seed=seed) if frac < 1.0 \
        else embeddings_ds
    rows = sample.take(sample_size)
    if not rows:
        raise ValueError("pq_train: embeddings dataset is empty")
    mat = _normalize(_matrix([r["embedding"] for r in rows])
                     .astype(np.float64))
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        sub = mat[:, j * dsub:(j + 1) * dsub]
        idx = rng.choice(len(sub), size=min(ks, len(sub)), replace=False)
        cent = sub[idx].copy()
        for _ in range(iters):
            # plain Euclidean k-means per subspace (subvectors are NOT
            # unit-norm; assignment by min L2 == max dot - ||c||^2/2)
            d2 = (np.add.outer((sub * sub).sum(1), (cent * cent).sum(1))
                  - 2.0 * (sub @ cent.T))
            assign = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j, :len(cent)] = cent
        if len(cent) < ks:  # degenerate tiny sample: pad with copies
            books[j, len(cent):] = cent[0]
    return embeddings_ds, books


def pq_encode(embeddings_ds, books: np.ndarray):
    """Streaming encode pass: each vector becomes `m` uint8 codes
    (nearest codebook entry per subspace) — dim*4 bytes -> m bytes per
    vector (64-dim float32 -> 8 bytes at m=8), the compression that
    lets a 100 TB embedding column sit in cluster RAM as ~1.5 TB of
    codes.  Codes ride as a fixed-size list column next to vec_id."""
    m, ks, dsub = books.shape
    norms = (books * books).sum(axis=2)  # (m, ks)

    def encode(batch: pa.Table) -> pa.Table:
        emb = _normalize(_matrix(batch.column("embedding"))
                         .astype(np.float64))
        n = len(emb)
        codes = np.empty((n, m), dtype=np.uint8)
        for j in range(m):
            sub = emb[:, j * dsub:(j + 1) * dsub]
            d2 = norms[j][None, :] - 2.0 * (sub @ books[j].T)
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.uint8()), m),
        })

    return embeddings_ds.map_batches(encode, batch_format="pyarrow")


def pq_topk(embeddings_ds, queries: np.ndarray, k: int = 10, m: int = 8,
            ks: int = 16, sample_size: int = 2048, seed: int = 5):
    """PQ ANN via asymmetric distance computation (ADC): per query,
    precompute the (m, ks) inner-product table query-subvector x
    codebook entry; a row's approximate cosine is then m table lookups
    summed — no float vector ever touched after the encode pass.
    Partial top-k per batch + the shared `_merge_topk` driver merge,
    identical in shape to the exact path so recall is directly
    comparable (tested >= the pinned bar vs brute force)."""
    embeddings_ds, books = pq_train(embeddings_ds, m=m, ks=ks,
                                    sample_size=sample_size, seed=seed)
    codes_ds = pq_encode(embeddings_ds, books)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    dsub = books.shape[2]
    # ADC tables: tab[q, j, c] = <q_subj, books[j, c]>
    tab = np.einsum("qjd,jcd->qjc",
                    qn.reshape(len(qn), m, dsub), books)

    def partial(batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id").to_numpy()
        codes = np.asarray(batch.column("code").combine_chunks()
                           .flatten()).reshape(len(vid), m)
        # scores[q, row] = sum_j tab[q, j, codes[row, j]]
        scores = tab[:, np.arange(m)[None, :], codes].sum(axis=2)
        kk = min(k, scores.shape[1])
        out_q, out_id, out_sim = [], [], []
        for qi in range(len(qn)):
            col = scores[qi]
            # lexicographic (-sim, vec_id): PQ collapses near-dups to
            # IDENTICAL codes, so exact score ties are the norm, and
            # plain argpartition would keep a batching-dependent subset
            # (see BruteForceTopK / MaskedTopK)
            order = np.lexsort((vid, -col))[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_id.append(vid[order])
            out_sim.append(col[order])
        return pa.table({"query_idx": pa.array(np.concatenate(out_q),
                                               pa.int64()),
                         "vec_id": pa.array(
                             np.concatenate(out_id).astype(np.int64),
                             pa.int64()),
                         "sim": pa.array(np.concatenate(out_sim),
                                         pa.float64())})

    partials = codes_ds.map_batches(partial, batch_format="pyarrow",
                                    batch_size=4096)
    return _merge_topk(partials, k)


def ivfpq_topk(embeddings_ds, queries: np.ndarray, k: int = 10,
               n_clusters: int = 16, nprobe: int = 4, m: int = 8,
               ks: int = 16, sample_size: int = 2048, seed: int = 5):
    """IVF + PQ composed: the full 100 TB ANN recipe — coarse IVF
    partition pruning (probe only `nprobe` clusters per query) over
    PQ-coded rows (m bytes/vector), scored by ADC table lookups.  This
    is the simplified flat-PQ variant (codes quantize the raw vector,
    not the residual): recall matches `pq_topk` restricted to the
    probed partitions, and `nprobe == n_clusters` degrades exactly to
    `pq_topk`.  One train pass (centroids + codebooks off one sample),
    one streaming encode pass emitting (vec_id, cluster, code), then
    the probe scan reads only matching partitions."""
    embeddings_ds = embeddings_ds.materialize()  # train + encode reuse
    assigned, cent = ivf_build(embeddings_ds, n_clusters=n_clusters,
                               sample_size=sample_size, seed=seed)
    _, books = pq_train(embeddings_ds, m=m, ks=ks,
                        sample_size=sample_size, seed=seed)
    mm, _, dsub = books.shape
    norms = (books * books).sum(axis=2)

    def encode(batch: pa.Table) -> pa.Table:
        emb = _normalize(_matrix(batch.column("embedding"))
                         .astype(np.float64))
        n = len(emb)
        codes = np.empty((n, mm), dtype=np.uint8)
        for j in range(mm):
            sub = emb[:, j * dsub:(j + 1) * dsub]
            d2 = norms[j][None, :] - 2.0 * (sub @ books[j].T)
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "cluster": batch.column("cluster"),
            "code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.uint8()), mm),
        })

    codes_ds = assigned.map_batches(encode, batch_format="pyarrow")
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_probe = [set(map(int, row)) for row in
               np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]]
    wanted = pa.array(sorted({c for s in q_probe for c in s}), pa.int64())
    tab = np.einsum("qjd,jcd->qjc", qn.reshape(len(qn), mm, dsub), books)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch.column("cluster").cast(pa.int64()),
                        value_set=wanted)
        batch = batch.filter(mask)
        empty = pa.table({"query_idx": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        vid = batch.column("vec_id").to_numpy()
        cl = batch.column("cluster").to_numpy()
        codes = np.asarray(batch.column("code").combine_chunks()
                           .flatten()).reshape(len(vid), mm)
        scores = tab[:, np.arange(mm)[None, :], codes].sum(axis=2)
        out_q, out_id, out_sim = [], [], []
        for qi in range(len(qn)):
            allow = np.isin(cl, np.fromiter(q_probe[qi], dtype=np.int64))
            if not allow.any():
                continue
            col = np.where(allow, scores[qi], -np.inf)
            kk = min(k, int(allow.sum()))
            order = np.lexsort((vid, -col))[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_id.append(vid[order])
            out_sim.append(col[order])
        if not out_q:
            return empty
        return pa.table({"query_idx": pa.array(np.concatenate(out_q),
                                               pa.int64()),
                         "vec_id": pa.array(
                             np.concatenate(out_id).astype(np.int64),
                             pa.int64()),
                         "sim": pa.array(np.concatenate(out_sim),
                                         pa.float64())})

    partials = codes_ds.map_batches(partial, batch_format="pyarrow",
                                    batch_size=4096)
    return _merge_topk(partials, k)


class KnnGraph:
    """Actor-pool stage for the exact k-nearest-neighbor GRAPH: every
    row gets its top-k cosine neighbors (self excluded) against the
    broadcast corpus matrix.  Unlike BruteForceTopK (Q queries, driver
    merges partials), the broadcast side here is COMPLETE, so each
    batch emits its rows' final top-k directly — no driver merge, the
    output stays a distributed Dataset of N*k edges.

    Scale shape: the corpus matrix ships once per actor (documented
    bound: D=64 float64 at 10M rows is ~5 GB — beyond that use the
    IVF/LSH paths in this module, the same exact/approx split as
    embed_cosine_dups vs cosine_dup_pairs_lsh).  Per batch the kernel
    is one (B, N) matmul plus ONE vectorized lexsort along axis=-1.
    Selection ranks on ROUND(sim, 4) DESC, vec_id ASC — matching the
    SQL oracle, which ranks on the SAME rounded value: ranking on raw
    floats would let a last-ulp dgemm-vs-sequential-sum difference
    pick different rank-k edges across engines whenever two candidates
    near-tie (the regime near-dup corpora live in); after rounding,
    ties resolve by id identically on both sides.  No Python loop
    over rows."""

    def __init__(self, ids: np.ndarray, matrix: np.ndarray, k: int = 3,
                 dtype=np.float64):
        self.ids = np.asarray(ids, dtype=np.int64)
        self.m = _normalize(np.asarray(matrix, dtype=dtype))
        self.k = k
        self.dtype = dtype

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch.column("vec_id").to_numpy()
        emb = _normalize(_matrix(batch.column("embedding"), self.dtype))
        if len(src) == 0 or len(self.ids) < 2:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        sims = emb @ self.m.T  # (B, N)
        # mask self-matches by id (works under duplicates of the id
        # space being impossible: vec_id is the table key)
        sims[src[:, None] == self.ids[None, :]] = -np.inf
        # rank on the reported precision, half-away like DuckDB ROUND
        sims = round_half_away(sims, 4)
        k = min(self.k, len(self.ids) - 1)
        order = np.lexsort(
            (np.broadcast_to(self.ids, sims.shape), -sims), axis=-1)[:, :k]
        dst = self.ids[order]
        top = np.take_along_axis(sims, order, axis=-1)
        return pa.table({
            "src": pa.array(np.repeat(src.astype(np.int64), k), pa.int64()),
            "dst": pa.array(dst.reshape(-1), pa.int64()),
            "sim": pa.array(top.reshape(-1), pa.float64()),
        })


def knn_graph(embeddings_ds, k: int = 3, concurrency=None,
              dtype=np.float64):
    """Exact kNN graph over an embeddings Dataset -> Dataset of
    (src, dst, sim) edges, k per src.  One driver-side collect builds
    the broadcast matrix (exactness baseline; see KnnGraph docstring
    for the scale bound and the IVF/LSH alternative)."""
    rows = embeddings_ds.take_all()  # broadcast side: bounded, see above
    if not rows:
        import ray.data as rd

        # _normalize on a (0,) array would AxisError in the actor ctor
        return rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                       "dst": pa.array([], pa.int64()),
                                       "sim": pa.array([], pa.float64())}))
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    matrix = np.asarray([r["embedding"] for r in rows], dtype=dtype)
    return embeddings_ds.map_batches(
        KnnGraph,
        fn_constructor_kwargs={"ids": ids, "matrix": matrix, "k": k,
                               "dtype": dtype},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency or _elastic_pool(),
    )
