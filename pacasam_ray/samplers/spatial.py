"""SpatialSampler (reference: src/pacasam/samplers/spatial.py:8-21)."""

from __future__ import annotations

import pandas as pd

from ..catalogue import PATCH_INFO
from ..stages.filters import exclude_ids
from .algos import sample_with_stratification
from .base import FILE_ID_COLNAME, SALT_SPATIAL, Sampler


class SpatialSampler(Sampler):
    """Stratified sampling by slab (file_id) — the engine's dominant shuffle.

    Pipeline: broadcast anti-join (M2) → project to ids (payloads stay out of
    the shuffle) → groupby(file_id) stratified quota sample with iterative
    completion (O2) → stamp → val-split (O9).
    """

    def get_patches(self, catalogue, num_to_sample=None, current_selection_ids=(), **kw) -> pd.DataFrame:
        if not num_to_sample:
            num_to_sample = self.cf["target_total_num_patches"]
        ds = catalogue
        if len(list(current_selection_ids)):
            ds = exclude_ids(ds, current_selection_ids, columns=PATCH_INFO)
        patches = sample_with_stratification(
            ds, num_to_sample, SALT_SPATIAL, strata=FILE_ID_COLNAME, columns=PATCH_INFO
        )
        self.log.info(f"{self.name} kept {min(num_to_sample, len(patches))} rows of the {num_to_sample} requested")
        patches = patches.copy()
        patches["sampler"] = self.name
        self._set_validation_patches_with_stratification(patches, keys=[FILE_ID_COLNAME])
        return patches[self.sampling_schema + [FILE_ID_COLNAME]]
