"""M6 `normalize_df` — global two-pass normalization, distributed.

Reference (src/pacasam/samplers/algos.py:65-91):
1. zeros → NaN (ignored by the stats);
2. standardize (x − mean)/(std + 1e-5) with GLOBAL per-column stats, or
   quantile-transform (sklearn QuantileTransformer, subsample=100_000);
3. NaN → per-column min of the transformed values (0 if all-NaN).
Raises UnexpectedNaNValuesError on pre-existing NaN.

Ray-Data-first shape:
- pass 1 is a PARTIAL aggregation: each batch emits one tiny row of
  per-column (n_nonzero, sum, sumsq, min, n_null); the driver combines the
  partials (integer sums over int features ⇒ exact, order-invariant stats).
- pass 2 broadcasts the stats and applies the transform vectorized per batch.
Quantilization fits the quantile grid on a deterministic hash-rank subsample
(≤ subsample rows — mirroring sklearn's subsample=100_000) and applies it
with np.interp per batch.

The standardized value for a zero input is the per-column minimum of the
transformed nonzero values = (min_nonzero − mean)/(std + ε), so NO second
aggregation pass is needed — one stats pass, one apply pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..hashing import rank_key

EPSILON = 10e-6  # reference algos.py:14 (note: 10e-6 == 1e-5)


class UnexpectedNaNValuesError(ValueError):
    """Reference: src/pacasam/exceptions.py:4-9."""


def _partial_stats(columns):
    def _f(batch: pa.Table) -> pa.Table:
        out = {}
        for c in columns:
            is_int = pa.types.is_integer(batch.schema.field(c).type)
            if is_int:
                # Integer inputs: sum in int64 — EXACT and order-invariant, so
                # global mean/std are bit-identical at any partitioning (and
                # match a DuckDB oracle computing the same expressions).
                v = batch[c].to_numpy(zero_copy_only=False).astype(np.int64)
                nz = v[v != 0]
                out[f"{c}__n"] = [int(nz.size)]
                out[f"{c}__sum"] = [int(nz.sum()) if nz.size else 0]
                out[f"{c}__sumsq"] = [int((nz * nz).sum()) if nz.size else 0]
                out[f"{c}__min"] = [float(nz.min()) if nz.size else np.inf]
                out[f"{c}__nan"] = [0]
            else:
                v = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
                nan_mask = np.isnan(v)
                nz = v[(v != 0) & ~nan_mask]
                out[f"{c}__n"] = [int(nz.size)]
                out[f"{c}__sum"] = [float(nz.sum()) if nz.size else 0.0]
                out[f"{c}__sumsq"] = [float((nz * nz).sum()) if nz.size else 0.0]
                out[f"{c}__min"] = [float(nz.min()) if nz.size else np.inf]
                out[f"{c}__nan"] = [int(nan_mask.sum())]
        return pa.table(out)

    return _f


def compute_normalization_stats(ds, columns: list[str]) -> dict:
    """Pass 1: combine per-batch partials into global per-column stats.

    std uses ddof=1 (pandas default, matching reference `.std()`).
    """
    partials = ds.map_batches(
        _partial_stats(columns), batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    stats = {}
    for c in columns:
        if partials[f"{c}__nan"].sum() > 0:
            raise UnexpectedNaNValuesError(f"column {c} has NaN values before normalization")
        n = int(partials[f"{c}__n"].sum())
        s = float(partials[f"{c}__sum"].sum())
        ss = float(partials[f"{c}__sumsq"].sum())
        mn = float(partials[f"{c}__min"].min())
        if n == 0:
            stats[c] = {"n": 0, "mean": 0.0, "std": 0.0, "min": np.inf}
            continue
        mean = s / n
        var = max(0.0, (ss - n * mean * mean) / (n - 1)) if n > 1 else 0.0
        stats[c] = {"n": n, "mean": mean, "std": float(np.sqrt(var)), "min": mn}
    return stats


def _standardize_one(v: np.ndarray, st: dict) -> np.ndarray:
    out = (v - st["mean"]) / (st["std"] + EPSILON)
    # zero inputs → per-column min of transformed values (0 if all-zero column)
    fill = (st["min"] - st["mean"]) / (st["std"] + EPSILON) if st["n"] else 0.0
    out[v == 0] = fill
    return out


def validate_nan_free(ds, columns: list[str]) -> None:
    """Raise UnexpectedNaNValuesError if any column holds a NaN — the
    reference validates BEFORE either transform (algos.py:74-76), so the
    quantile path needs this even though its grid fit never aggregates
    sums. One shuffle-free pass: per-block NaN counts (one int per column
    per block) → driver sum. Integer columns are NaN-free by type and
    skipped without reading."""
    sch = ds.schema()  # Ray Schema wrapper: parallel .names / .types lists
    types = dict(zip(sch.names, sch.types))
    float_cols = [c for c in columns if not pa.types.is_integer(types[c])]
    if not float_cols:
        return

    def _f(batch: pa.Table) -> pa.Table:
        out = {}
        for c in float_cols:
            v = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            out[c] = [int(np.isnan(v).sum())]
        return pa.table(out)

    parts = ds.select_columns(float_cols).map_batches(
        _f, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    for c in float_cols:
        if int(parts[c].sum()) > 0:
            raise UnexpectedNaNValuesError(
                f"column {c} has NaN values before normalization"
            )


def fit_quantile_grid(ds, columns: list[str], n_quantiles: int, subsample: int = 100_000,
                      key: str = "patch_id") -> dict:
    """Quantile references fitted on a deterministic hash-rank subsample of
    nonzero values (mirrors sklearn QuantileTransformer(subsample=100_000))."""
    def _sample(batch: pa.Table) -> pa.Table:
        t = batch.select([key] + columns)
        r = rank_key(t[key].to_numpy(zero_copy_only=False), 777)
        t = t.append_column("__r", pa.array(r))
        if t.num_rows <= subsample:
            return t
        # per-batch partial top-n: the driver receives ≤ subsample rows per
        # block, never the dataset
        idx = np.argpartition(r, subsample - 1)[:subsample]
        return t.take(pa.array(np.sort(idx)))

    sampled = ds.map_batches(_sample, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    sampled = sampled.sort_values(["__r", key], kind="mergesort").head(subsample)
    grids = {}
    qs = np.linspace(0, 1, n_quantiles)
    for c in columns:
        v = sampled[c].to_numpy().astype(np.float64)
        v = v[v != 0]
        grids[c] = np.quantile(v, qs) if v.size else np.zeros(n_quantiles)
    return {"quantiles": grids, "q": qs}


def apply_normalization(ds, columns: list[str], *, normalization: str = "standardization",
                        stats: dict | None = None, grid: dict | None = None):
    """Pass 2: broadcast stats/grid, transform vectorized per batch."""
    stats_ref = ray.put({"stats": stats, "grid": grid, "mode": normalization})

    def _apply(batch: pa.Table) -> pa.Table:
        b = ray.get(stats_ref)  # zero-copy from plasma; stateless task stage
        st, grid_b, mode = b["stats"], b["grid"], b["mode"]
        for c in columns:
            v = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            if mode == "standardization":
                out = _standardize_one(v, st[c])
            else:
                g = grid_b["quantiles"][c]
                out = np.interp(v, g, grid_b["q"])
                nzmin = float(np.interp(g[0], g, grid_b["q"])) if len(g) else 0.0
                out[v == 0] = nzmin
            i = batch.column_names.index(c)
            batch = batch.set_column(i, c, pa.array(out))
        return batch

    return ds.map_batches(_apply, batch_format="pyarrow", zero_copy_batch=True)


def normalize_dataset(ds, columns: list[str], normalization: str = "standardization",
                      n_quantiles: int = 50):
    """Full M6: stats/fit pass + apply pass. Returns the transformed Dataset."""
    if normalization == "standardization":
        stats = compute_normalization_stats(ds, columns)
        return apply_normalization(ds, columns, normalization=normalization, stats=stats)
    # match the reference: NaN validation precedes EITHER transform
    # (src/pacasam/samplers/algos.py:74-76)
    validate_nan_free(ds, columns)
    grid = fit_quantile_grid(ds, columns, n_quantiles)
    return apply_normalization(ds, columns, normalization=normalization, grid=grid)


def normalize_df(df: pd.DataFrame, columns: list[str], normalization: str = "standardization",
                 n_quantiles: int = 50) -> pd.DataFrame:
    """Driver-side twin for small frames (exact reference semantics,
    algos.py:65-91) — used by tests and small-selection paths."""
    if df[columns].isna().any().any():
        raise UnexpectedNaNValuesError("NaN before normalization")
    out = df.copy()
    vals = out[columns].astype(float).replace(0, np.nan)
    if normalization == "standardization":
        vals = (vals - vals.mean()) / (vals.std() + EPSILON)
    else:
        qs = np.linspace(0, 1, n_quantiles)
        for c in columns:
            v = vals[c].dropna().to_numpy()
            g = np.quantile(v, qs) if v.size else np.zeros(n_quantiles)
            vals[c] = np.interp(vals[c].to_numpy(), g, qs)
    vals = vals.fillna(vals.min(numeric_only=True).fillna(0))
    out[columns] = vals
    return out
