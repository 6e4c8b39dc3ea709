"""TripleSampler (reference: src/pacasam/samplers/triple.py:10-40).

Driver-side orchestration: Targetted (no completion) → Diversity with
n = (total − |targetted|)//2 → Spatial for the exact remainder. The
inter-stage arithmetic requires materialized counts between stages, so the
stage barriers are semantic (SURVEY.md §2.8); each stage is itself a
distributed Ray Data pipeline, and selections (small id tables) flow
between them driver-side.
"""

from __future__ import annotations

import warnings

import pandas as pd

from .base import PATCH_ID_COLNAME, Sampler
from .diversity import DiversitySampler
from .spatial import SpatialSampler
from .targetted import TargettedSampler


class TripleSampler(Sampler):
    def get_patches(self, catalogue, **kw) -> pd.DataFrame:
        ts = TargettedSampler(
            sampling_config=self.cf, log=self.log, complete_with_spatial_sampling=False
        )
        targetted = ts.get_patches(catalogue)
        targetted = ts.drop_duplicates_by_id_and_log_sampling_attrition(targetted)

        num_to_sample = (self.cf["target_total_num_patches"] - len(targetted)) // 2
        if num_to_sample < 0:
            warnings.warn(
                f"Over-constrained config: the per-class minimum proportions add up "
                f"past 1.0, so the targetted stage alone already returned more than "
                f"the requested n={self.cf['target_total_num_patches']} patches; "
                "skipping the diversity and spatial stages."
            )
            return targetted

        dvs = DiversitySampler(sampling_config=self.cf, log=self.log)
        diverse = dvs.get_patches(catalogue, num_to_sample=num_to_sample)
        selection = pd.concat([targetted, diverse], ignore_index=True)
        selection = dvs.drop_duplicates_by_id_and_log_sampling_attrition(selection)

        num_to_complete = self.cf["target_total_num_patches"] - len(selection)
        cs = SpatialSampler(sampling_config=self.cf, log=self.log)
        others = cs.get_patches(
            catalogue,
            num_to_sample=num_to_complete,
            current_selection_ids=selection[PATCH_ID_COLNAME].tolist(),
        )
        selection = pd.concat([selection, others], ignore_index=True)
        return self.drop_duplicates_by_id_and_log_sampling_attrition(selection)
