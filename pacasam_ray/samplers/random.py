"""RandomSampler (reference: src/pacasam/samplers/random.py:8-21)."""

from __future__ import annotations

import pandas as pd

from ..catalogue import PATCH_INFO
from ..stages.filters import exclude_ids
from .algos import sample_randomly
from .base import FILE_ID_COLNAME, SALT_RANDOM, Sampler


class RandomSampler(Sampler):
    """Global uniform sampling with optional id exclusion.

    Pipeline: broadcast anti-join (M2) → hash-rank top-n (O1) → stamp
    sampler → val-split marking (O9, driver-side on the small selection).
    """

    def get_patches(self, catalogue, num_to_sample=None, current_selection_ids=(), **kw) -> pd.DataFrame:
        if not num_to_sample:
            num_to_sample = self.cf["target_total_num_patches"]
        ds = catalogue
        if len(list(current_selection_ids)):
            ds = exclude_ids(ds, current_selection_ids, columns=PATCH_INFO)
        patches = sample_randomly(ds, num_to_sample, SALT_RANDOM, columns=PATCH_INFO)
        self.log.info(f"{self.name} kept {min(num_to_sample, len(patches))} rows of the {num_to_sample} requested")
        patches = patches.copy()
        patches["sampler"] = self.name
        self._set_validation_patches_with_stratification(patches, keys=[FILE_ID_COLNAME])
        return patches[self.sampling_schema + [FILE_ID_COLNAME]]
