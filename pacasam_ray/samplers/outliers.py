"""OutliersSampler — clustering-based outlier mining, distributed.

Reference (src/pacasam/samplers/outliers.py:11-61): standardize histogram
columns (M6), fit hdbscan.HDBSCAN over ALL rows (T3, a global model), keep
the top-k rows by ``outlier_scores`` (O6), val-split stratified over
[cluster_id, file_id].

hdbscan is not available in this environment, and a global single-actor fit
does not scale to 10^12 rows anyway. The engine substitutes a
fit-on-sample / score-distributed design with the same selection semantics
(cluster labels + a monotone outlier score, top-k by score):

1. deterministic hash-rank subsample (≤ fit_sample_size rows) → driver fits
   k-means (pure numpy, fixed seed, Lloyd iterations) on standardized
   features;
2. centers broadcast once (ray.put); a stateless map_batches stage scores
   every row: cluster_id = nearest center, outlier_score = distance to that
   center rescaled by the per-cluster max distance observed in the fit
   sample (≈ GLOSH's "how far out of your own cluster are you");
3. top-k by (score desc, patch_id) via per-batch partial top-k — no global
   sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..catalogue import PATCH_INFO
from ..hashing import rank_key
from ..stages.normalize import normalize_dataset
from .base import FILE_ID_COLNAME, PATCH_ID_COLNAME, Sampler


def kmeans_fit(arr: np.ndarray, n_clusters: int, n_iter: int = 10, salt: int = 4242):
    """Deterministic numpy k-means: centers seeded by hash-rank rows."""
    n = len(arr)
    n_clusters = max(1, min(n_clusters, n))
    r = rank_key(np.arange(n, dtype=np.int64), salt)
    centers = arr[np.argsort(r, kind="stable")[:n_clusters]].astype(np.float64)
    for _ in range(n_iter):
        d = ((arr[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        lab = d.argmin(1)
        for k in range(n_clusters):
            m = lab == k
            if m.any():
                centers[k] = arr[m].mean(0)
    d = ((arr[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    lab = d.argmin(1)
    dist = np.sqrt(d[np.arange(n), lab])
    scale = np.ones(n_clusters)
    for k in range(n_clusters):
        m = lab == k
        if m.any():
            scale[k] = max(dist[m].max(), 1e-12)
    return centers, scale


def _score_fn(model_ref, cols):
    """Stateless scoring stage: nearest-center labeling + rescaled distance
    score (centers broadcast once via the object store)."""

    def _score(batch: pa.Table) -> pa.Table:
        centers, scale = ray.get(model_ref)
        arr = np.column_stack([batch[c].to_numpy(zero_copy_only=False) for c in cols])
        d = ((arr[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        lab = d.argmin(1)
        dist = np.sqrt(d[np.arange(len(arr)), lab])
        score = np.clip(dist / scale[lab], 0.0, None)
        batch = batch.append_column("cluster_id", pa.array(lab.astype(np.int64)))
        batch = batch.append_column("outlier_scores", pa.array(score))
        return batch

    return _score


class OutliersSampler(Sampler):
    def get_patches(self, catalogue, num_to_sample=None, **kw) -> pd.DataFrame:
        if num_to_sample is None:
            num_to_sample = self.cf["target_total_num_patches"]
        ocf = self.cf["OutliersSampler"]
        cols = list(ocf["columns"])
        n_clusters = int(ocf.get("n_clusters", ocf.get("hdbscan_kwargs", {}).get("min_cluster_size", 8)))
        fit_sample_size = int(ocf.get("fit_sample_size", 100_000))

        # The normalized projection feeds two scans (fit-sample + scoring);
        # both stream — no mid-pipeline materialization of the full dataset.
        ds = catalogue.select_columns(PATCH_INFO + cols)
        ds = normalize_dataset(ds, cols, normalization="standardization")

        # 1. fit on a deterministic subsample: per-batch partial top-n by
        # hash rank, so the driver receives ≤ fit_sample_size rows per
        # block — never the dataset.
        from .algos import smallest_n

        def _rank(batch: pa.Table) -> pa.Table:
            r = rank_key(batch[PATCH_ID_COLNAME].to_numpy(zero_copy_only=False), 4243)
            return batch.append_column("__r", pa.array(r))

        ranked = ds.map_batches(_rank, batch_format="pyarrow", zero_copy_batch=True)
        sample = smallest_n(
            ranked, fit_sample_size, col="__r", tiebreak=PATCH_ID_COLNAME
        ).to_pandas()
        model = kmeans_fit(sample[cols].to_numpy(), n_clusters)
        model_ref = ray.put(model)

        # 2. distributed scoring
        scored = ds.map_batches(
            _score_fn(model_ref, cols), batch_format="pyarrow", zero_copy_batch=True
        )

        # 3. top-k by outlier score (desc): per-batch partial top-k, tiny merge
        k = num_to_sample

        def _local_topk(batch: pa.Table) -> pa.Table:
            if batch.num_rows <= k:
                return batch
            v = batch["outlier_scores"].to_numpy(zero_copy_only=False)
            idx = np.argpartition(-v, k - 1)[:k]
            return batch.take(pa.array(np.sort(idx)))

        top = scored.map_batches(_local_topk, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
        top = top.sort_values(
            ["outlier_scores", PATCH_ID_COLNAME], ascending=[False, True], kind="mergesort"
        ).head(k)

        patches = top[PATCH_INFO + ["cluster_id", "outlier_scores"]].copy()
        patches["sampler"] = self.name
        self._set_validation_patches_with_stratification(
            patches, keys=["cluster_id", FILE_ID_COLNAME]
        )
        self.log.info(f"{self.name}: N={min(num_to_sample, len(patches))}/{num_to_sample} patches.")
        return patches[self.sampling_schema + [FILE_ID_COLNAME]]
