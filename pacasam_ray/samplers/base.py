"""Sampler base: sampling schema, val-split marking, dedup + attrition log.

Reference: src/pacasam/samplers/sampler.py. The selection tables produced by
samplers are SMALL (bounded by the sampling target, e.g. 5k patches out of
100k, configs/Lipac.yml:4), so — exactly like the reference — val-split
marking and dedup on selections run driver-side in pandas; only catalogue
scans/shuffles are distributed.
"""

from __future__ import annotations

import logging
from math import floor

import numpy as np
import pandas as pd

from ..hashing import rank_key

PATCH_ID_COLNAME = "patch_id"
FILE_ID_COLNAME = "file_id"
SPLIT_COLNAME = "split"
SAMPLER_COLNAME = "sampler"
SAMPLING_SCHEMA = [PATCH_ID_COLNAME, SPLIT_COLNAME, SAMPLER_COLNAME]

# Salt namespaces so each sampler/round draws independent ranks.
SALT_RANDOM = 1000
SALT_SPATIAL = 2000
SALT_VAL = 3000
SALT_TARGETTED = 4000
SALT_DIVERSITY = 5000
SALT_OUTLIERS = 6000
SALT_TRIM = 9000


def sample_randomly_df(df: pd.DataFrame, n: int, salt: int) -> pd.DataFrame:
    """O1 on a small driver-side frame: n smallest hash ranks."""
    if n >= len(df):
        return df
    r = rank_key(df[PATCH_ID_COLNAME].to_numpy(), salt)
    order = np.lexsort((df[PATCH_ID_COLNAME].to_numpy(), r))
    return df.iloc[order[:n]]


def sample_with_stratification_df(
    df: pd.DataFrame, n: int, keys, salt: int, max_rounds: int = 50
) -> pd.DataFrame:
    """O2 (algos.py:23-56) on a small driver-side frame.

    Per-strata quota floor(n/nunique) (≥1) by hash rank, trim overshoot
    globally by rank, iterative completion (+1 per strata per round) until n.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if n <= 0 or df.empty:
        return df.head(0)
    work = df.copy()
    work["__rank"] = rank_key(work[PATCH_ID_COLNAME].to_numpy(), salt)
    work = work.sort_values(["__rank", PATCH_ID_COLNAME], kind="mergesort")
    nunique = work.groupby(keys, sort=False).ngroups
    quota = max(1, n // max(1, nunique))
    selected = work.groupby(keys, sort=False, group_keys=False).head(quota)
    selected = selected.sort_values(["__rank", PATCH_ID_COLNAME], kind="mergesort").head(n)
    rounds = 0
    while len(selected) < n and rounds < max_rounds:
        rounds += 1
        rest = work[~work[PATCH_ID_COLNAME].isin(selected[PATCH_ID_COLNAME])]
        if rest.empty:
            break
        extra = rest.groupby(keys, sort=False, group_keys=False).head(1)
        extra = extra.sort_values(["__rank", PATCH_ID_COLNAME], kind="mergesort").head(
            n - len(selected)
        )
        selected = pd.concat([selected, extra])
    return selected.drop(columns="__rank")


class Sampler:
    """Abstract sampler (reference: samplers/sampler.py:17-40).

    ``get_patches(catalogue_ds)`` must return a pandas DataFrame whose
    columns are a superset of SAMPLING_SCHEMA.
    """

    sampling_schema = SAMPLING_SCHEMA

    def __init__(self, sampling_config: dict, log: logging.Logger | None = None):
        self.name = self.__class__.__name__
        self.cf = sampling_config
        self.log = log or logging.getLogger("pacasam_ray")

    def get_patches(self, catalogue, **kwargs) -> pd.DataFrame:
        raise NotImplementedError("abstract; use a concrete sampler")

    def drop_duplicates_by_id_and_log_sampling_attrition(self, df: pd.DataFrame) -> pd.DataFrame:
        """M9 (sampler.py:42-51): exact dedup on patch_id + attrition log."""
        if not len(df):
            return df
        n_sampled = len(df)
        out = df.drop_duplicates(subset=[PATCH_ID_COLNAME])
        self.log.info(
            f"{self.name}: {n_sampled} ids --> {len(out)} distinct ids "
            f"(uniqueness ratio: {len(out) / n_sampled:.03f})"
        )
        return out

    def requested_total(self, num_to_sample=None) -> int:
        """Stage budget: the caller's override (composition stages pass
        one) or the configured final dataset size."""
        return num_to_sample or self.cf["target_total_num_patches"]

    def pool_without(self, catalogue, current_selection_ids, columns):
        """M2 exclusion step shared by the hash-rank samplers: ship the
        already-picked ids ONCE via ``ray.put`` and drop them inside
        ``map_batches`` (stages/filters.exclude_ids) — a broadcast
        anti-join over the streaming catalogue, never a shuffle. The
        excluded set is bounded by the sampling target, so the broadcast
        is small by construction. No-op when nothing is excluded."""
        from ..stages.filters import exclude_ids

        excluded = list(current_selection_ids)
        if not excluded:
            return catalogue
        return exclude_ids(catalogue, excluded, columns=columns)

    def hash_rank_pick(self, catalogue, *, num_to_sample,
                       current_selection_ids, salt: int, kernel,
                       log_tag: str) -> pd.DataFrame:
        """The whole body of a hash-rank sampler, shared by Random and
        Spatial: broadcast-exclude prior picks, run the distributed pick
        ``kernel(pool, target, salt)`` over the streaming catalogue, log
        the kept/requested counts, and stamp the selection tail. Only the
        kernel differs between samplers (global top-n vs slab-stratified
        quota fill)."""
        from ..catalogue import PATCH_INFO

        target = self.requested_total(num_to_sample)
        pool = self.pool_without(catalogue, current_selection_ids,
                                 columns=PATCH_INFO)
        picked = kernel(pool, target, salt)
        self.log.info(
            f"{self.name} {log_tag}: kept "
            f"{min(target, len(picked))} of {target} requested")
        return self.finalize_selection(picked)

    def finalize_selection(self, picked: pd.DataFrame) -> pd.DataFrame:
        """Shared selection tail (reference sampler.py:53-65 semantics):
        stamp the producing sampler's name, mark the validation split by
        file_id-stratified hash rank, and project to the sampling schema
        plus file_id (which downstream completion stages stratify over).
        Runs driver-side on the bounded selection, like the reference."""
        picked = picked.copy()
        picked[SAMPLER_COLNAME] = self.name
        self._set_validation_patches_with_stratification(
            picked, keys=[FILE_ID_COLNAME])
        return picked[self.sampling_schema + [FILE_ID_COLNAME]]

    def _set_validation_patches_with_stratification(
        self, patches: pd.DataFrame, keys=FILE_ID_COLNAME
    ) -> pd.DataFrame:
        """O9 (sampler.py:53-65): split=test when no val fraction configured;
        else split=train and floor(frac·len) patches flagged val, picked by
        stratified sampling over ``keys``."""
        patches[SPLIT_COLNAME] = "test"
        if self.cf.get("frac_validation_set"):
            patches.loc[:, SPLIT_COLNAME] = "train"
            num_val = floor(self.cf["frac_validation_set"] * len(patches))
            val_ids = sample_with_stratification_df(
                patches, num_val, keys=keys, salt=SALT_VAL
            )[PATCH_ID_COLNAME]
            patches.loc[patches[PATCH_ID_COLNAME].isin(val_ids), SPLIT_COLNAME] = "val"
        return patches
