"""run_sampling — the main query pipeline (reference: run_sampling.py:23-67).

catalogue Dataset → sampler.get_patches (distributed stages, small selection
driver-side) → enrich selection by inner join back to the catalogue (J1,
broadcast-small-side) → Parquet sink (S5) → stats (A2-A4).
"""

from __future__ import annotations

import logging

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ..io import read_parquet_sized

from ..catalogue import build_catalogue
from ..samplers import SAMPLERS_LIBRARY

log = logging.getLogger("pacasam_ray")

DEFAULT_CONFIG = {
    # mirrors configs/Synthetic.yml:4-47
    "target_total_num_patches": 50,
    "frac_validation_set": 0.1,
    "TargettedSampler": {
        "targets": {
            "c0": {"target_min_samples_proportion": 0.20},
            "c1": {"target_min_samples_proportion": 0.05},
            "c2": {"target_min_samples_proportion": 0.05},
            "c3": {"target_min_samples_proportion": 0.20},
        }
    },
    "DiversitySampler": {
        "columns": [
            "nb_sol", "nb_bati", "nb_vegetation_basse", "nb_vegetation_moyenne",
            "nb_vegetation_haute", "nb_pont", "nb_eau", "nb_sursol_perenne",
            "nb_non_classes",
        ],
        "normalization": "standardization",
        "n_quantiles": 20,
        "max_chunk_size_for_fps": 5000,
    },
    "OutliersSampler": {
        "columns": [
            "nb_sol", "nb_bati", "nb_vegetation_basse", "nb_vegetation_moyenne",
            "nb_vegetation_haute", "nb_pont", "nb_eau", "nb_sursol_perenne",
            "nb_non_classes",
        ],
        "n_clusters": 8,
        "fit_sample_size": 100_000,
    },
}


def make_catalogue(sf_dir: str) -> ray.data.Dataset:
    """documents.parquet → derived patch catalogue (columns pruned at read)."""
    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars", "lang"]
    )
    return build_catalogue(ds)


def extract_selection(catalogue: ray.data.Dataset, selection: pd.DataFrame) -> ray.data.Dataset:
    """J1 `connector.extract` (connectors/connector.py:48-51): inner join of
    the catalogue with the selection on patch_id, broadcast-small-side —
    the selection (ids + split + sampler) ships once via the object store and
    each batch probes it with an Arrow hash join; no shuffle."""
    sel_tbl = pa.Table.from_pandas(
        selection[["patch_id", "split", "sampler"]], preserve_index=False
    )
    sel_ref = ray.put(sel_tbl)

    def _join(batch: pa.Table) -> pa.Table:
        sel = ray.get(sel_ref)  # zero-copy from plasma
        return batch.join(sel, keys="patch_id", join_type="inner")

    return catalogue.map_batches(_join, batch_format="pyarrow", zero_copy_batch=True)


def run_sampling(sf_dir: str, sampler_name: str, config: dict | None = None,
                 output_path: str | None = None):
    """Full pipeline; returns the enriched selection as a pandas DataFrame."""
    cf = {**DEFAULT_CONFIG, **(config or {})}
    catalogue = make_catalogue(sf_dir)
    sampler = SAMPLERS_LIBRARY[sampler_name](sampling_config=cf, log=log)
    if getattr(sampler, "dataset_native", False):
        # corpus-sized selection (CopySampler): stamp + stream, no driver
        # round-trip and no broadcast join-back
        enriched = sampler.get_patches_dataset(catalogue)
        if output_path:
            enriched.write_parquet(output_path)
            return enriched
        return enriched.to_pandas()
    selection = sampler.get_patches(catalogue)
    enriched = extract_selection(catalogue, selection)
    if output_path:
        enriched.write_parquet(output_path)
        return enriched
    return enriched.to_pandas()
