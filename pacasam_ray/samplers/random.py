"""RandomSampler — global uniform patch sampling as a Ray Data pipeline.

Behavioral contract from the reference (src/pacasam/samplers/random.py:8-21);
the execution plan is this engine's own:

- the catalogue stays a streaming ``ray.data.Dataset`` end to end — no
  driver materialization of the corpus, only of the (bounded) selection;
- exclusion ids ship once via ``ray.put`` and filter inside ``map_batches``
  (broadcast anti-join, M2) instead of a shuffle join;
- "uniform" is a deterministic hash rank (hashing.py ``hmix`` of patch_id),
  not RNG state, so the selection is a pure function of (ids, salt) —
  partition-count invariant and reproduced bit-for-bit by the generated
  DuckDB oracle (queries._sql_sampler);
- the top-n itself is the 3-level associative prune of
  ``samplers/algos.smallest_n`` (per-batch partial top-n → tree re-prune →
  bounded driver merge), never a global sort.
"""

from __future__ import annotations

import pandas as pd

from ..catalogue import PATCH_INFO
from ..stages.filters import exclude_ids
from .algos import sample_randomly
from .base import FILE_ID_COLNAME, SALT_RANDOM, Sampler


class RandomSampler(Sampler):
    def get_patches(self, catalogue, num_to_sample=None,
                    current_selection_ids=(), **kw) -> pd.DataFrame:
        target = num_to_sample or self.cf["target_total_num_patches"]

        pool = catalogue
        excluded = list(current_selection_ids)
        if excluded:
            pool = exclude_ids(pool, excluded, columns=PATCH_INFO)

        patches = sample_randomly(pool, target, SALT_RANDOM,
                                  columns=PATCH_INFO)
        self.log.info(
            f"{self.name} hash-rank top-n: kept "
            f"{min(target, len(patches))} of {target} requested")

        patches = patches.copy()
        patches["sampler"] = self.name
        self._set_validation_patches_with_stratification(
            patches, keys=[FILE_ID_COLNAME])
        return patches[self.sampling_schema + [FILE_ID_COLNAME]]
