"""Distributed spherical k-means — full-data Lloyd refinement.

The reference engine has no clustering; this belongs to the
training-data operator family (corpus bucketing, domain discovery,
coarse quantizers for IVF indexes).  Scale shape: per iteration ONE
map pass over the embeddings — each block emits at most `n_clusters`
partial rows (a float64 sum vector, a count, an objective partial),
the driver folds blocks x k partials (independent of dataset size)
and re-broadcasts k centroids via ray.put.  Nothing fact-sized lands
on the driver, and the per-batch kernel is fully vectorized (matmul
assignment + bincount scatter-adds).

Contrast with ann._kmeans: that one fits on a driver-side SAMPLE (good
enough for IVF routing); this one runs the assignment/update steps
over EVERY row, which is what you want when the clusters themselves
are the product (e.g. per-domain corpus buckets feeding downstream
per-cluster pipelines).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rdf_n3_ray.stages.ann import _kmeans, _matrix, _normalize


def kmeans_lloyd(embeddings_ds, n_clusters: int = 8, iters: int = 5,
                 sample_size: int = 2048, seed: int = 5,
                 col: str = "embedding"):
    """Fit spherical k-means with `iters` full-data Lloyd iterations.

    Returns (centroids, history): centroids is (k, d) float64
    L2-normalized, history is the per-iteration mean cosine objective
    (non-decreasing by the standard Lloyd argument).
    """
    import ray
    from ray.data.dataset import MaterializedDataset

    # materialized: init sample + `iters` assignment passes all
    # re-consume this dataset (skip if the caller already materialized
    # — kmeans_cluster_profile shares one copy across fit and assign)
    ds = (embeddings_ds if isinstance(embeddings_ds, MaterializedDataset)
          else embeddings_ds.materialize())
    n = ds.count()
    if n == 0:
        raise ValueError("kmeans_lloyd: empty embeddings dataset")
    frac = min(1.0, sample_size / n)
    sample = ds.random_sample(frac, seed=seed) if frac < 1.0 else ds
    mat = _matrix([r[col] for r in sample.take(sample_size)])
    cent = _kmeans(mat, n_clusters, seed=seed)
    k = len(cent)  # may be < n_clusters when n < n_clusters

    history: list[float] = []
    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            if batch.num_rows == 0:  # _matrix gives (0,0) — no matmul
                return pa.table({
                    "cluster": pa.array([], pa.int32()),
                    "count": pa.array([], pa.int64()),
                    "sim_sum": pa.array([], pa.float64()),
                    "vec_sum": pa.array([], pa.list_(pa.float64())),
                })
            emb = _normalize(_matrix(batch.column(col))
                             .astype(np.float64))
            sims = emb @ c.T
            a = np.argmax(sims, axis=1)
            best = sims[np.arange(len(a)), a]
            counts = np.bincount(a, minlength=k).astype(np.int64)
            sim_sum = np.bincount(a, weights=best, minlength=k)
            # d scatter-adds via bincount-with-weights: vectorized C,
            # no per-row Python
            sums = np.stack([np.bincount(a, weights=emb[:, j],
                                         minlength=k)
                             for j in range(emb.shape[1])], axis=1)
            return pa.table({
                "cluster": pa.array(np.arange(k, dtype=np.int32)),
                "count": pa.array(counts),
                "sim_sum": pa.array(sim_sum, pa.float64()),
                "vec_sum": pa.array(list(sums), pa.list_(pa.float64())),
            })

        parts = (ds.map_batches(partial, batch_format="pyarrow")
                 .to_pandas())  # blocks x k rows — driver fold is tiny
        counts = np.zeros(k, dtype=np.int64)
        sim_tot = 0.0
        sums = np.zeros_like(cent)
        for cl, cnt, ss, vs in zip(parts["cluster"], parts["count"],
                                   parts["sim_sum"], parts["vec_sum"]):
            counts[cl] += int(cnt)
            sim_tot += float(ss)
            sums[cl] += np.asarray(vs, dtype=np.float64)
        history.append(sim_tot / n)
        nonempty = counts > 0
        new_cent = cent.copy()
        new_cent[nonempty] = sums[nonempty] / counts[nonempty, None]
        cent = _normalize(new_cent)
    return cent, history


def kmeans_assign(embeddings_ds, centroids: np.ndarray,
                  col: str = "embedding"):
    """Streaming assignment pass: adds `cluster` and `sim` (cosine to
    the assigned centroid — already computed by the argmax, so callers
    profiling cluster quality need no second matmul).  Centroids ship
    once per task spec (closure capture), not per batch."""
    cent = np.asarray(centroids, dtype=np.float64)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # _matrix gives (0,0) — no matmul
            return (batch
                    .append_column("cluster", pa.array([], pa.int32()))
                    .append_column("sim", pa.array([], pa.float64())))
        emb = _normalize(_matrix(batch.column(col)).astype(np.float64))
        sims = emb @ cent.T
        cl = np.argmax(sims, axis=1)
        best = sims[np.arange(len(cl)), cl]
        return (batch
                .append_column("cluster",
                               pa.array(cl.astype(np.int32), pa.int32()))
                .append_column("sim", pa.array(best, pa.float64())))

    return embeddings_ds.map_batches(assign, batch_format="pyarrow")


def kmeans_cluster_profile(embeddings_ds, n_clusters: int = 8,
                           iters: int = 4, seed: int = 5) -> pd.DataFrame:
    """Fit + assign + per-cluster profile (size, mean cosine to its
    centroid) — the queries() surface for the operator."""
    # one materialization shared by the fit's iters passes AND the
    # assignment pass (kmeans_lloyd skips re-materializing)
    ds = embeddings_ds.materialize()
    cent, _ = kmeans_lloyd(ds, n_clusters=n_clusters,
                           iters=iters, seed=seed)
    assigned = kmeans_assign(ds, cent)

    def profile(batch: pa.Table) -> pd.DataFrame:
        # `sim` was computed by the assignment matmul — no recompute
        cl = batch.column("cluster").to_numpy()
        return pd.DataFrame({
            "cluster": cl.astype("int32"),
            "size": np.ones(len(cl), dtype="int64"),
            "sim_sum": batch.column("sim").to_numpy(),
        }).groupby("cluster", as_index=False).sum()

    parts = (assigned.map_batches(profile, batch_format="pyarrow")
             .to_pandas())
    g = parts.groupby("cluster", as_index=False).agg(
        size=("size", "sum"), sim_sum=("sim_sum", "sum"))
    g["mean_sim"] = g["sim_sum"] / g["size"]
    g["size"] = g["size"].astype("int64")
    return (g[["cluster", "size", "mean_sim"]]
            .sort_values("cluster").reset_index(drop=True))
