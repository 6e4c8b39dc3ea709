"""OutliersSampler — clustering-based outlier mining, distributed.

Reference (src/pacasam/samplers/outliers.py:11-61): standardize histogram
columns (M6), fit hdbscan.HDBSCAN over ALL rows (T3, a global model), keep
the top-k rows by ``outlier_scores`` (O6), val-split stratified over
[cluster_id, file_id].

hdbscan is not available in this environment, and a global single-actor fit
does not scale to 10^12 rows anyway. The engine substitutes a
fit-on-sample / score-distributed design with the same selection semantics
(cluster labels + a monotone *density* outlier score, top-k by score):

1. deterministic hash-rank subsample (≤ fit_sample_size rows) → driver fits
   k-means (pure numpy, fixed seed, Lloyd iterations) on standardized
   features for the cluster labels;
2. density model à la GLOSH: d_k(x) = distance to the k-th nearest neighbor
   in a hash-rank reference subset of the fit sample is the (inverse)
   density estimate; each cluster's density peak eps(c) = min d_k over its
   fit-sample members. score(x) = clip(1 − eps(c(x)) / d_k(x), 0, 1) —
   the direct analog of GLOSH's 1 − λ(x)/λ_max(cluster): ≈0 for points as
   dense as their cluster's core, →1 for points in low-density regions.
   This scores "density outlier", not merely "far from my centroid": a
   point midway between two tight clusters now ranks high even when its
   centroid distance is ordinary;
3. centers + reference matrix + per-cluster peaks broadcast once
   (ray.put); a stateless map_batches stage labels and scores every row
   with one |x|²−2x·refᵀ+|ref|² kernel; top-k by (score desc, patch_id)
   via per-batch partial top-k — no global sort.
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


EPS_DIST = 1e-12


def kmeans_fit(arr: np.ndarray, n_clusters: int, n_iter: int = 10, salt: int = 4242):
    """Deterministic numpy k-means: centers seeded by hash-rank rows.
    Returns (centers, labels) over the fit sample."""
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
    return centers, d.argmin(1)


# Cap the |chunk| × |ref| distance-matrix scratch at ~64 MiB of float32 so
# a task scoring a whole block never allocates rows × ref_size at once
# (a 100k-row block × 4096 refs would be 1.6 GB per concurrent task).
_KNN_SCRATCH_ELEMS = 16 * 1024 * 1024


def _knn_dist(arr: np.ndarray, ref: np.ndarray, k: int) -> np.ndarray:
    """Distance from each row of ``arr`` to its k-th (0-based) nearest row
    in ``ref`` — |x|²−2x·refᵀ+|ref|² kernels over bounded row chunks, no
    per-row Python work. The 0-based index makes the estimate
    self-exclusive for ref members (their d=0 self match occupies slot 0).

    float32 throughout: the row-wise ``np.partition`` dominates this
    kernel and is memory-bound, so halving element width nearly halves
    wall time; the score is a heuristic ranking with no oracle twin, and
    a float32 k-NN radius perturbs it far below the ranking's own
    sample-of-the-density noise."""
    a32 = np.ascontiguousarray(arr, dtype=np.float32)
    r32 = np.ascontiguousarray(ref, dtype=np.float32)
    rn = (r32 * r32).sum(1)
    out = np.empty(len(arr), dtype=np.float32)
    step = max(1, _KNN_SCRATCH_ELEMS // max(1, len(ref)))
    for lo in range(0, len(arr), step):
        a = a32[lo:lo + step]
        d2 = (a * a).sum(1, keepdims=True) - 2.0 * (a @ r32.T) + rn[None, :]
        np.maximum(d2, 0.0, out=d2)
        out[lo:lo + step] = np.partition(d2, k, axis=1)[:, k]
    return np.sqrt(out.astype(np.float64))


# Calibration of per-cluster density peaks only needs a representative
# subset of the fit sample — computing d_k for every one of 100k fit rows
# costs more than the whole distributed scoring pass.
_CALIBRATION_MAX_ROWS = 25_000


def fit_outlier_model(arr: np.ndarray, n_clusters: int, knn_k: int = 16,
                      ref_size: int = 512, salt: int = 4242):
    """Fit the broadcastable outlier model on the (standardized) fit sample:
    k-means centers for labels + a GLOSH-like density calibration.

    Returns (centers, ref, k, eps) where ``ref`` is a hash-rank reference
    subset for kNN density estimates and ``eps[c]`` is cluster c's density
    peak (min k-NN distance over its fit-sample members)."""
    centers, labels = kmeans_fit(arr, n_clusters, salt=salt)
    n = len(arr)
    order = np.argsort(rank_key(np.arange(n, dtype=np.int64), salt + 1),
                       kind="stable")
    ref = np.ascontiguousarray(arr[order[: min(ref_size, n)]], dtype=np.float64)
    # k=0 marks the degenerate len(ref)<2 case: np.partition at kth=1 on a
    # one-column distance matrix raises, and a single-ref density estimate
    # is meaningless anyway — scoring short-circuits to all-zero scores.
    k = min(knn_k, max(0, len(ref) - 1))
    if k == 0:
        return centers, ref, 0, np.full(len(centers), EPS_DIST)
    calib_idx = order[: min(_CALIBRATION_MAX_ROWS, n)]
    dk = _knn_dist(arr[calib_idx].astype(np.float64), ref, k)
    calib_labels = labels[calib_idx]
    eps = np.full(len(centers), max(np.min(dk), EPS_DIST))
    for c in range(len(centers)):
        m = calib_labels == c
        if m.any():
            eps[c] = max(dk[m].min(), EPS_DIST)
    return centers, ref, k, eps


def _score_fn(model_ref, cols):
    """Stateless scoring stage (model broadcast once via the object store):
    cluster_id = nearest k-means center; outlier_scores = GLOSH-like
    1 − eps(cluster)/d_k(x), clipped to [0, 1]."""

    def _score(batch: pa.Table) -> pa.Table:
        centers, ref, k, eps = ray.get(model_ref)
        arr = np.column_stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in cols]
        ).astype(np.float64)
        d = ((arr[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        lab = d.argmin(1)
        if k == 0:  # degenerate fit sample (< 2 ref rows): no density signal
            score = np.zeros(len(arr), dtype=np.float64)
        else:
            dk = np.maximum(_knn_dist(arr, ref, k), EPS_DIST)
            score = np.clip(1.0 - eps[lab] / dk, 0.0, 1.0)
        batch = batch.append_column("cluster_id", pa.array(lab.astype(np.int64)))
        batch = batch.append_column("outlier_scores", pa.array(score))
        return batch

    return _score


def _glosh_score_fn(model_ref, cols):
    """Stateless GLOSH scoring stage: the broadcast model carries the fit
    matrix + condensed-tree calibration; every row is labeled/scored via
    the nearest-fit-member approximation (samplers/glosh.py)."""

    def _score(batch: pa.Table) -> pa.Table:
        from .glosh import glosh_score

        model = ray.get(model_ref)
        arr = np.column_stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in cols]
        ).astype(np.float64)
        lab, score = glosh_score(model, arr)
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
        knn_k = int(ocf.get("knn_k", 8))
        density_ref_size = int(ocf.get("density_ref_size", 512))
        # "glosh" = HDBSCAN condensed-tree scorer (real lib when importable,
        # pure-numpy twin otherwise — samplers/glosh.py); default stays the
        # calibration-free k-means + kNN-density substitute
        scorer = str(ocf.get("scorer", "knn_density"))

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
        if scorer == "glosh":
            from .glosh import glosh_fit

            model = glosh_fit(sample[cols].to_numpy(),
                              min_cluster_size=max(2, n_clusters))
            model_ref = ray.put(model)
            score_fn = _glosh_score_fn(model_ref, cols)
        else:
            model = fit_outlier_model(
                sample[cols].to_numpy(), n_clusters,
                knn_k=knn_k, ref_size=density_ref_size,
            )
            model_ref = ray.put(model)
            score_fn = _score_fn(model_ref, cols)

        # 2. distributed scoring
        scored = ds.map_batches(
            score_fn, batch_format="pyarrow", zero_copy_batch=True
        )

        # 3. top-k by outlier score (desc) = smallest-k by negated score —
        # rides smallest_n's tree reduce + bounded streaming merge, so the
        # driver pull stays O(k) however many blocks the scan produced.
        k = num_to_sample

        def _neg(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__neg_score",
                pa.array(-batch["outlier_scores"].to_numpy(zero_copy_only=False)),
            )

        from .algos import smallest_n

        top = smallest_n(
            scored.map_batches(_neg, batch_format="pyarrow", zero_copy_batch=True),
            k, col="__neg_score", tiebreak=PATCH_ID_COLNAME,
        ).to_pandas().drop(columns="__neg_score")

        patches = top[PATCH_INFO + ["cluster_id", "outlier_scores"]].copy()
        patches["sampler"] = self.name
        self._set_validation_patches_with_stratification(
            patches, keys=["cluster_id", FILE_ID_COLNAME]
        )
        self.log.info(f"{self.name} kept {min(num_to_sample, len(patches))} rows of the {num_to_sample} requested")
        return patches[self.sampling_schema + [FILE_ID_COLNAME]]
