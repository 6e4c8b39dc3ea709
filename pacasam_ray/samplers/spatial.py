"""SpatialSampler — slab-stratified patch sampling as a Ray Data pipeline.

Behavioral contract from the reference (src/pacasam/samplers/spatial.py:8-21);
the physical plan is this engine's own and is the repo's dominant-shuffle
case study:

- per-slab (file_id) quotas with the reference's iterative completion are
  computed by ``samplers/algos.sample_with_stratification``: one
  shuffle-free counts scan solves the exact completion depth up front, so
  ONE pruned groupby shuffle (ids only — payload columns are projected out
  before the exchange) replaces the reference's per-round passes;
- the per-row rank is deterministic hmix arithmetic, making the whole
  selection — including the completion rounds, via their closed form
  ORDER BY (GREATEST(g - quota, 0), rank) — reproducible by the generated
  DuckDB oracle in queries.py;
- exclusion ids are a ``ray.put`` broadcast filter, never a shuffle join.

Scale design (100 TB): the exchange moves only (patch_id, file_id, rank)
triples for rows that can still win a quota slot — the counts scan prunes
every stratum already at quota before any bytes shuffle. Hot slabs cannot
skew the exchange beyond their quota + completion depth, both of which
are O(n / strata) by the closed form, so a 10^12-row catalogue with a few
thousand slabs shuffles megabytes, not terabytes.
"""

from __future__ import annotations

import pandas as pd

from ..catalogue import PATCH_INFO
from .algos import sample_with_stratification
from .base import FILE_ID_COLNAME, SALT_SPATIAL, Sampler


class SpatialSampler(Sampler):
    def get_patches(self, catalogue, num_to_sample=None,
                    current_selection_ids=(), **kw) -> pd.DataFrame:
        target = self.requested_total(num_to_sample)
        pool = self.pool_without(catalogue, current_selection_ids,
                                 columns=PATCH_INFO)
        picked = sample_with_stratification(
            pool, target, SALT_SPATIAL, strata=FILE_ID_COLNAME,
            columns=PATCH_INFO)
        self.log.info(
            f"{self.name} slab-stratified pick: kept "
            f"{min(target, len(picked))} of {target} requested")
        return self.finalize_selection(picked)
