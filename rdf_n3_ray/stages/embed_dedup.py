"""Embedding-cosine near-duplicate detection over the `embeddings` table.

Two paths:

- `cosine_dup_pairs` — EXACT all-pairs at-or-above a cosine threshold.
  The normalized embedding matrix is broadcast once via `ray.put`
  (read-only in every task, never re-shipped per batch); each
  `map_batches` task computes its block's rows against the full matrix
  with one float64 matmul and emits pairs (a < b). O(N^2/P) compute per
  task but fully distributed and zero-shuffle. This is the oracle-able
  baseline: DuckDB `list_cosine_similarity` on a self-join reproduces it.

- `cosine_dup_pairs_lsh` — the 100 TB scale path. Random-hyperplane
  signatures bucket vectors (`groupby(bucket)`), pairwise cosine only
  within buckets; multiple plane tables (bands) give recall. All-pairs
  work drops from O(N^2) to sum of per-bucket squares; the only wide op
  is the bucket groupby. Partitioning assumption: bucket keys are
  hash-distributed and individual buckets fit in a worker (guaranteed by
  `n_planes` scaling with log N).

No counterpart in the reference (rdf-n3 has no near-dedup — SURVEY §2.8);
required by the build brief's training-data-ops list.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .ann import _matrix, _normalize
from .rounding import round_half_away


def _pairs_against_matrix(ids_blk, mat_blk, ids_all, mat_all, threshold):
    """Pairs (a<b, sim>=threshold) between a block and the full matrix."""
    sims = mat_blk @ mat_all.T  # (b, N) float64
    out_a, out_b, out_s = [], [], []
    for i in range(mat_blk.shape[0]):
        row = sims[i]
        mask = (row >= threshold) & (ids_all > ids_blk[i])
        idx = np.nonzero(mask)[0]
        if idx.size:
            out_a.append(np.full(idx.size, ids_blk[i], dtype=np.int64))
            out_b.append(ids_all[idx])
            out_s.append(row[idx])
    if not out_a:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float64))
    return np.concatenate(out_a), np.concatenate(out_b), np.concatenate(out_s)


def cosine_dup_pairs(embeddings_ds, threshold: float = 0.95,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     round_to: int = 4):
    """Exact cosine near-dup pairs. Broadcast small side = the id+matrix
    (vectors are short; 500k rows x 64 dims float64 = 256 MB — fine in
    the object store; beyond that use `cosine_dup_pairs_lsh`)."""
    import ray

    # materialize once: the broadcast build (to_arrow_refs) and the
    # block_pairs map below both consume it — without this the read
    # lineage executes twice
    selected = embeddings_ds.select_columns([id_col, emb_col]).materialize()
    tbl = selected.to_arrow_refs()
    # driver-side concat of the *small* side only (ids + vectors)
    full = pa.concat_tables([ray.get(r) for r in tbl])
    ids_all = full[id_col].to_numpy().astype(np.int64)
    mat_all = _normalize(_matrix(full[emb_col]).astype(np.float64))
    ids_ref = ray.put(ids_all)
    mat_ref = ray.put(mat_all)

    def block_pairs(batch: pa.Table) -> pa.Table:
        ids_a = ray.get(ids_ref)
        mat_a = ray.get(mat_ref)
        ids_b = batch[id_col].to_numpy().astype(np.int64)
        mat_b = _normalize(_matrix(batch[emb_col]).astype(np.float64))
        a, b, s = _pairs_against_matrix(ids_b, mat_b, ids_a, mat_a, threshold)
        return pa.table({
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
            "sim": pa.array(round_half_away(s, round_to), pa.float64()),
        })

    return selected.map_batches(
        block_pairs, batch_format="pyarrow", batch_size=2048)


def cosine_dup_pairs_lsh(embeddings_ds, threshold: float = 0.9,
                         id_col: str = "vec_id", emb_col: str = "embedding",
                         n_planes: int = 6, bands: int = 4, seed: int = 17,
                         round_to: int = 4):
    """Approximate cosine near-dup via random-hyperplane LSH buckets.

    TRUE scale path: the embedding vectors travel WITH their bucket rows
    through the groupby shuffle, so per-worker memory is proportional to
    bucket size — nothing is driver-collected or broadcast (unlike
    `cosine_dup_pairs`, whose exact all-pairs semantics require the full
    matrix).  Partitioning assumption: individual buckets fit a worker
    (n_planes scales with log N)."""
    rng = np.random.default_rng(seed)

    def sig(batch: pa.Table, band: int, planes: np.ndarray) -> pd.DataFrame:
        mat = _normalize(_matrix(batch[emb_col]).astype(np.float64))
        bits = (mat @ planes.T) > 0
        key = np.zeros(len(mat), dtype=np.int64)
        for j in range(bits.shape[1]):
            key = (key << 1) | bits[:, j]
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy().astype(np.int64),
            "bucket": key + (np.int64(band) << 32),
            # object array of np vectors (cheaper than to_pylist; the
            # in-bucket _matrix fallback consumes either)
            emb_col: batch[emb_col].to_numpy(zero_copy_only=False),
        })

    def in_bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].to_numpy()
        mat = _normalize(np.asarray(
            [np.asarray(v, dtype=np.float64) for v in group[emb_col]]))
        sims = mat @ mat.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= threshold
        a, b = ids[iu[keep]], ids[ju[keep]]
        swap = a > b
        a2 = np.where(swap, b, a).astype(np.int64)
        b2 = np.where(swap, a, b).astype(np.int64)
        return pd.DataFrame({"a": a2, "b": b2,
                             "sim": round_half_away(sims[iu, ju][keep], round_to)})

    # probe dimensionality from one row (cheap; schema-only would not
    # give the list length)
    first = embeddings_ds.take(1)
    if not first:
        return embeddings_ds.map_batches(
            lambda b: pd.DataFrame({"a": pd.Series(dtype="int64"),
                                    "b": pd.Series(dtype="int64"),
                                    "sim": pd.Series(dtype="float64")}),
            batch_format="pyarrow")
    dim = len(first[0][emb_col])

    sigs = None
    src = embeddings_ds.select_columns([id_col, emb_col])
    for band in range(bands):
        planes = rng.standard_normal((n_planes, dim))
        part = src.map_batches(
            lambda t, b=band, p=planes: sig(t, b, p),
            batch_format="pyarrow")
        sigs = part if sigs is None else sigs.union(part)

    pairs = (sigs.groupby("bucket")
             .map_groups(in_bucket_pairs, batch_format="pandas"))
    # identical pair can surface from several bands — global dedup on a
    # coarse bucket (see stages/dedup.py dedup_pairs)
    from .dedup import dedup_pairs

    return dedup_pairs(pairs, keep_cols=["a", "b", "sim"])


def dup_groups_from_pairs(pairs_df: pd.DataFrame,
                          id_col_a: str = "a", id_col_b: str = "b"):
    """Union-find connected components over a (small) near-dup pair list.
    Driver-side: the pair list is tiny relative to the corpus. Returns
    DataFrame (id, group) where group = min id in the component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs_df[id_col_a], pairs_df[id_col_b]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((x, find(x)) for x in parent)
    return pd.DataFrame(rows, columns=["id", "group"])


def semdedup(embeddings_ds, tau: float = 0.35, n_clusters: int = 8,
             iters: int = 4, seed: int = 5, chunk: int = 1024,
             centroids=None):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
    by spherical k-means clustering + within-cluster cosine pairing.
    Each embedding is assigned to a centroid; inside each cluster,
    pairs with cosine >= tau form duplicate components and only the
    min-id member of each component is kept.  Returns a Dataset
    (vec_id, cluster, keep) — one row per input vector.

    Scale shape: the k-means fit/assign passes stream (cluster.py);
    pair mining is a per-cluster `map_groups` whose matmul is chunked
    (`chunk` x cluster_size peak, never cluster_size^2), and the
    union-find touches only at-or-above-threshold pairs (dup-mass) with
    a vectorized pointer-halving resolution — no per-row Python over
    the cluster.  Partitioning assumption (the paper's own recipe):
    n_clusters scales with corpus size (k ~ sqrt(n)) so one cluster's
    embedding matrix fits in a worker.  Cross-cluster near-dup pairs
    are invisible by design — that is SemDeDup's recall/cost trade."""
    from .cluster import kmeans_assign, kmeans_lloyd

    ds = embeddings_ds.materialize()  # fit passes + assign reuse it
    if centroids is None:
        centroids, _ = kmeans_lloyd(ds, n_clusters=n_clusters,
                                    iters=iters, seed=seed)
    assigned = kmeans_assign(ds, centroids)

    def cluster_keep(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = _normalize(_matrix(list(g["embedding"].to_numpy()[order]))
                         .astype(np.float64))
        n = len(ids)
        parent = np.arange(n, dtype=np.int64)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = int(parent[x])
            return x

        for lo in range(0, n, chunk):
            sims = mat[lo:lo + chunk] @ mat.T
            ii, jj = np.nonzero(sims >= tau)
            gi = ii + lo
            upper = jj > gi  # each unordered pair once
            # ids are index-sorted, so min root == min vec_id
            for a, b in zip(gi[upper], jj[upper]):
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        while True:  # vectorized pointer-halving to the fixed point
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        return pd.DataFrame({
            "vec_id": ids,
            "cluster": g["cluster"].to_numpy(np.int32)[order],
            "keep": parent == np.arange(n)})

    return (assigned.groupby("cluster")
            .map_groups(cluster_keep, batch_format="pandas"))
