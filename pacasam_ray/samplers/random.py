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

Scale design (100 TB): the only data that ever reaches the driver is the
n-row selection; the catalogue scan is a single pruned-column pass whose
per-block partial top-n keeps at most n candidate rows per block in
flight, so object-store pressure is O(blocks · n), independent of corpus
size. Determinism means a re-run after a mid-scan failure reproduces the
identical selection — resumability comes from purity, not checkpoints.

The sampler body is the shared ``Sampler.hash_rank_pick`` template; this
module contributes only the kernel choice (global top-n) and its salt
namespace.
"""

from __future__ import annotations

from functools import partial

import pandas as pd

from ..catalogue import PATCH_INFO
from .algos import sample_randomly
from .base import SALT_RANDOM, Sampler

_KERNEL = partial(sample_randomly, columns=PATCH_INFO)


class RandomSampler(Sampler):
    def get_patches(self, catalogue, num_to_sample=None,
                    current_selection_ids=(), **kw) -> pd.DataFrame:
        return self.hash_rank_pick(
            catalogue, num_to_sample=num_to_sample,
            current_selection_ids=current_selection_ids,
            salt=SALT_RANDOM, kernel=_KERNEL, log_tag="hash-rank top-n")
