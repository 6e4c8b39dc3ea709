"""TargettedSampler (reference: src/pacasam/samplers/targetted.py:13-96)."""

from __future__ import annotations

import warnings
from math import floor

import pandas as pd

from ..catalogue import PATCH_INFO
from .algos import multi_stratified_sample
from .base import FILE_ID_COLNAME, PATCH_ID_COLNAME, SALT_TARGETTED, Sampler
from .spatial import SpatialSampler


class TargettedSampler(Sampler):
    """Meet per-descriptor prevalence constraints sequentially, then
    (optionally) complete with spatial sampling.

    Exact reference semantics preserved:
    - criteria processed ASCENDING by target proportion (targetted.py:85-96);
    - per-criterion quota = int(prop · target_total), clamped to available
      rows (targetted.py:65-66);
    - union of per-criterion selections, dedup by patch_id (M9);
    - warn if over target total (targetted.py:41-45); otherwise complete
      with SpatialSampler after RE-COMPUTING the residual validation
      fraction so the final val count is exact (targetted.py:46-57).
    """

    def __init__(self, sampling_config, log=None, complete_with_spatial_sampling: bool = True):
        # copy: the residual-val-fraction math mutates the config (as the
        # reference does in-place, targetted.py:50); keep the caller's intact.
        super().__init__(dict(sampling_config), log)
        self.complete_with_spatial_sampling = complete_with_spatial_sampling

    def get_patches(self, catalogue, **kw) -> pd.DataFrame:
        targets = self.cf["TargettedSampler"]["targets"]
        ordered = self.sorted_targets(targets)
        # Fused plan: ONE counts scan + ONE pruned shuffle for all criteria
        # (semantically the reference's per-criterion loop, targetted.py:28-39).
        specs = [
            {
                "name": name,
                "filter_col": name,
                "n": int(obj["target_min_samples_proportion"] * self.cf["target_total_num_patches"]),
                "salt": SALT_TARGETTED + i,
            }
            for i, (name, obj) in enumerate(ordered.items())
        ]
        pools = multi_stratified_sample(
            catalogue, specs, strata=FILE_ID_COLNAME, columns=PATCH_INFO
        )
        selection = []
        for i, (name, objectives) in enumerate(ordered.items()):
            selection.append(
                self._postprocess_matching_patches(
                    pools[name], name, objectives, specs[i]["n"]
                )
            )
        selection = pd.concat(selection, ignore_index=True)
        selection = self.drop_duplicates_by_id_and_log_sampling_attrition(selection)
        self.log.info(
            f"{self.name}: N={len(selection)} distinct patches selected to match requirements."
        )

        if len(selection) > self.cf["target_total_num_patches"]:
            warnings.warn(
                f"Selected more than the desired total of N={self.cf['target_total_num_patches']}. "
                "If this is not desired, please reconsider your targets."
            )
        elif self.complete_with_spatial_sampling:
            num_to_add = self.cf["target_total_num_patches"] - len(selection)
            final_num_val = floor(
                self.cf["frac_validation_set"] * self.cf["target_total_num_patches"]
            )
            num_val_to_add = final_num_val - int((selection["split"] == "val").sum())
            self.cf["frac_validation_set"] = (
                num_val_to_add / num_to_add if num_to_add else 0.0
            )
            ss = SpatialSampler(sampling_config=self.cf, log=self.log)
            completion = ss.get_patches(
                catalogue,
                num_to_sample=num_to_add,
                current_selection_ids=selection[PATCH_ID_COLNAME].tolist(),
            )
            selection = pd.concat([selection, completion], ignore_index=True)
            self.log.info(f"{self.name}: completed with N={num_to_add} additional patches.")
        return selection

    def _postprocess_matching_patches(self, patches, descriptor_name, objectives, target_n):
        """Per-criterion stamp + O9 on the fused M1→O2 result."""
        self.log.info(
            f"TargettedSampler: {descriptor_name} | "
            f"Target: {objectives['target_min_samples_proportion']} (n={target_n})."
        )
        if len(patches) < target_n:
            self.log.warning(
                f"Could not reach target for {descriptor_name}. | Found: "
                f"{len(patches) / self.cf['target_total_num_patches']:.03f} (n={len(patches)})."
            )
        patches = patches.copy()
        patches["sampler"] = self.name
        self._set_validation_patches_with_stratification(patches, keys=[FILE_ID_COLNAME])
        return patches[self.sampling_schema + [FILE_ID_COLNAME]]

    @staticmethod
    def sorted_targets(criteria: dict) -> dict:
        return dict(
            sorted(criteria.items(), key=lambda kv: kv[1]["target_min_samples_proportion"])
        )
