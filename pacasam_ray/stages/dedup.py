"""Exact deduplication — the engine's hash-shuffle dedup (M9/S1 at scale).

Reference dedups driver-side with ``drop_duplicates(subset=patch_id)``
(src/pacasam/connectors/lipac.py:91, src/pacasam/samplers/sampler.py:46).
At 10^12 rows dedup is an all-to-all exchange: hash-partition on the key and
keep one deterministic representative per group (lowest tiebreak value —
NOT "first seen", which is partition-order dependent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def dedup_exact(ds, key: str, tiebreak: str | None = None,
                num_partitions: int | None = None):
    """Keep the row with the smallest ``tiebreak`` per ``key`` group.

    Plan: ONE hash shuffle — co-locate whole key groups by key-hash bucket
    (`grouped_batch_map`), then one vectorized mergesort + duplicated-mask
    per ~256 MiB partition. No per-group Python (a `map_groups` callback
    costs ~50 µs/group — 87 s at 1.5M groups), and no join-back: the
    earlier Min-aggregate → equi-join plan paid a second all-to-all and
    Ray's actor-based hash join dominated (measured on a 2M-row md5-key
    dedup at 32 cpus: aggregate+join 31-40 s, this plan 9.4 s).
    Representative choice is a pure group function (min tiebreak), so the
    result is partition-count invariant either way.
    """
    from .partitioning import grouped_batch_map, pick_group_partitions

    if num_partitions is None:
        # a grouped_batch_map reduce is a pandas-callback-per-partition
        # stage: CPU-floored count (measured 9.4 s at 32 parts vs 14.6 s
        # at 8 on the 2M-row leg)
        num_partitions = pick_group_partitions(ds)
    tb = tiebreak or key

    def _keep_min(df):
        df = df.sort_values([key, tb], kind="mergesort")
        return df[~df[key].duplicated()]

    return grouped_batch_map(ds, [key], _keep_min, nparts=num_partitions)


def dedup_exact_prehashed(ds, key: str, tiebreak: str):
    """Scale path: per-batch partial dedup BEFORE the shuffle (combiner), so
    the aggregate's shuffle moves at most one row per key per input block
    instead of every duplicate."""

    def _local(batch: pa.Table) -> pa.Table:
        # Arrow-native (no pandas round-trip through object-dtype strings):
        # sort by (key, tiebreak) and keep the first row of each key run.
        if batch.num_rows <= 1:
            return batch
        t = batch.sort_by([(key, "ascending"), (tiebreak, "ascending")])
        k = t[key].combine_chunks()
        first = np.ones(len(k), dtype=bool)
        first[1:] = ~pc.equal(k.slice(1), k.slice(0, len(k) - 1)).to_numpy(
            zero_copy_only=False
        )
        return t.filter(pa.array(first))

    return dedup_exact(ds.map_batches(_local, batch_format="pyarrow"), key, tiebreak)
