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

The sampler body is the shared ``Sampler.hash_rank_pick`` template; this
module contributes only the kernel choice (stratified quota fill over
file_id slabs) and its salt namespace.
"""

from __future__ import annotations

from functools import partial

import pandas as pd

from ..catalogue import PATCH_INFO
from .algos import sample_with_stratification
from .base import FILE_ID_COLNAME, SALT_SPATIAL, Sampler

_KERNEL = partial(sample_with_stratification, strata=FILE_ID_COLNAME,
                  columns=PATCH_INFO)


class SpatialSampler(Sampler):
    def get_patches(self, catalogue, num_to_sample=None,
                    current_selection_ids=(), **kw) -> pd.DataFrame:
        return self.hash_rank_pick(
            catalogue, num_to_sample=num_to_sample,
            current_selection_ids=current_selection_ids,
            salt=SALT_SPATIAL, kernel=_KERNEL,
            log_tag="slab-stratified pick")
