"""TripleSampler — Targetted → Diversity → Spatial composition.

Behavioral contract from the reference (src/pacasam/samplers/triple.py:10-40),
including its exact stage arithmetic: the diversity stage draws
``(total − |targetted|) // 2`` patches and the spatial stage the exact
remainder after dedup. Those counts depend on the materialized size of the
previous stage's selection, so the stage barriers are SEMANTIC
(SURVEY.md §2.8) — they cannot pipeline. What this engine changes is
everything inside a stage:

- each stage is itself a distributed Ray Data pipeline (fused
  count-scan + pruned shuffle for Targetted, FPS actor kernel for
  Diversity, the closed-form stratified pick for Spatial);
- only the SELECTIONS (id tables bounded by the sampling target, not the
  corpus) cross the driver between stages;
- the spatial completion excludes prior picks via a ``ray.put`` broadcast
  filter rather than a shuffle join.

An over-constrained config (per-class minimum proportions summing past
1.0) short-circuits after the targetted stage, mirroring the reference's
warning semantics.

Count contract (driver-gated via queries.q_sampler_triple_counts): the
final selection always holds exactly ``target_total_num_patches``
distinct ids when the catalogue can fill the budgets, the targetted rows
are exactly the keep-first dedup of the criterion picks (first-occurrence
dedup means a diversity pick of an already-targetted id keeps the
targetted label), and diversity + spatial contribute the remainder. The
per-stage split of that remainder is the one quantity that depends on
the FPS geometry and is therefore conformance-tested rather than
SQL-oracled.

Scale design (100 TB): three catalogue passes (one per stage), each
independently pruned and shuffle-bounded as documented in its module;
the inter-stage state is two id lists bounded by the sampling target,
broadcast once each. Nothing corpus-sized ever crosses the driver.
"""

from __future__ import annotations

import warnings

import pandas as pd

from .base import PATCH_ID_COLNAME, Sampler
from .diversity import DiversitySampler
from .spatial import SpatialSampler
from .targetted import TargettedSampler


class TripleSampler(Sampler):
    def _targetted_stage(self, catalogue) -> pd.DataFrame:
        stage = TargettedSampler(
            sampling_config=self.cf, log=self.log,
            complete_with_spatial_sampling=False)
        picked = stage.get_patches(catalogue)
        return stage.drop_duplicates_by_id_and_log_sampling_attrition(picked)

    def _diversity_stage(self, catalogue, picked: pd.DataFrame,
                         budget: int) -> pd.DataFrame:
        stage = DiversitySampler(sampling_config=self.cf, log=self.log)
        diverse = stage.get_patches(catalogue, num_to_sample=budget)
        merged = pd.concat([picked, diverse], ignore_index=True)
        return stage.drop_duplicates_by_id_and_log_sampling_attrition(merged)

    def _spatial_completion(self, catalogue, picked: pd.DataFrame,
                            remainder: int) -> pd.DataFrame:
        stage = SpatialSampler(sampling_config=self.cf, log=self.log)
        completion = stage.get_patches(
            catalogue, num_to_sample=remainder,
            current_selection_ids=picked[PATCH_ID_COLNAME].tolist())
        merged = pd.concat([picked, completion], ignore_index=True)
        return self.drop_duplicates_by_id_and_log_sampling_attrition(merged)

    def get_patches(self, catalogue, **kw) -> pd.DataFrame:
        total = self.cf["target_total_num_patches"]

        picked = self._targetted_stage(catalogue)

        diversity_budget = (total - len(picked)) // 2
        if diversity_budget < 0:
            warnings.warn(
                f"Over-constrained config: the per-class minimum proportions "
                f"add up past 1.0, so the targetted stage alone already "
                f"returned more than the requested n={total} patches; "
                "skipping the diversity and spatial stages.")
            return picked

        picked = self._diversity_stage(catalogue, picked, diversity_budget)
        return self._spatial_completion(catalogue, picked,
                                        total - len(picked))
