"""Comparer — descriptive statistics of catalogue vs sampling.

Reference (src/pacasam/analysis/stats.py:21-107): writes CSVs comparing
boolean-descriptor prevalences and area/count sums between the full
catalogue and a sampling, globally and grouped by sampler/split.

Ray-Data-first: every statistic is a distributed aggregate (A2-A4) —
per-batch integer partials combined driver-side (exact) or a grouped
``groupby().aggregate`` — and only the tiny result frames are written.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..catalogue import PATCH_SIZE

# patch area in km² (constant per tile, analog of df.area/1e6, stats.py:29)
PATCH_AREA_KM2 = (PATCH_SIZE * PATCH_SIZE) / 1e6

CSV_NAMES = [
    "comparison_booleans_prevalence.csv",
    "comparison_area.csv",
    "sampling_booleans_prevalence_by_sampler.csv",
    "sampling_booleans_prevalence_by_split.csv",
    "sampling_area_by_split.csv",
]


def _bool_cols(ds) -> list[str]:
    schema = ds.schema().base_schema
    return [f.name for f in schema if f.type == pa.bool_() and f.name != "test"]


def prevalence_and_counts(ds, bool_cols: list[str], group_col: str | None = None) -> pd.DataFrame:
    """A2+A3: per-(group) bool prevalences + patch count + area, exact."""

    def _partial(t: pa.Table) -> pa.Table:
        if group_col is None:
            groups = pd.Series(["__all__"] * t.num_rows)
        else:
            groups = pd.Series(np.asarray(t[group_col]).astype(object))
        df = pd.DataFrame({"__g": groups})
        for c in bool_cols:
            df[c] = pc.cast(pc.fill_null(t[c], False), pa.int64()).to_numpy(zero_copy_only=False)
        g = df.groupby("__g", sort=False).agg(
            {**{c: "sum" for c in bool_cols}}
        )
        g["__n"] = df.groupby("__g", sort=False).size()
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("__g", sort=True).sum().reset_index()
    out = pd.DataFrame({"group": agg["__g"], "num_patches": agg["__n"].astype("int64")})
    out["area_km2"] = out["num_patches"] * PATCH_AREA_KM2
    for c in bool_cols:
        out[f"prev_{c}"] = agg[c].map(float) / agg["__n"].map(float)
    if group_col is None:
        out = out.drop(columns="group")
    else:
        out = out.rename(columns={"group": group_col})
    return out


class Comparer:
    """Writes the 5 comparison CSVs (reference stats.py:21-50)."""

    def __init__(self, output_path: str | Path):
        self.output_path = Path(output_path)
        self.output_path.mkdir(parents=True, exist_ok=True)

    def compare(self, catalogue_ds, sampling_ds) -> list[Path]:
        bool_cols = _bool_cols(catalogue_ds)
        written = []

        db_prev = prevalence_and_counts(catalogue_ds, bool_cols)
        smp_prev = prevalence_and_counts(sampling_ds, bool_cols)
        cmp_prev = pd.concat(
            [db_prev.assign(source="database"), smp_prev.assign(source="sampling")],
            ignore_index=True,
        )
        written.append(self._write(cmp_prev, CSV_NAMES[0]))

        cmp_area = cmp_prev[["source", "num_patches", "area_km2"]]
        written.append(self._write(cmp_area, CSV_NAMES[1]))

        by_sampler = prevalence_and_counts(sampling_ds, bool_cols, group_col="sampler")
        written.append(self._write(by_sampler, CSV_NAMES[2]))
        by_split = prevalence_and_counts(sampling_ds, bool_cols, group_col="split")
        written.append(self._write(by_split, CSV_NAMES[3]))
        written.append(
            self._write(by_split[["split", "num_patches", "area_km2"]], CSV_NAMES[4])
        )
        return written

    def _write(self, df: pd.DataFrame, name: str) -> Path:
        p = self.output_path / name
        df.to_csv(p, index=False)
        return p
