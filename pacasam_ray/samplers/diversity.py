"""DiversitySampler — chunked Farthest Point Sampling, distributed.

Reference (src/pacasam/samplers/diversity.py:10-95): sort the catalogue by
(file_id, patch_id) so chunks are spatially coherent (O7 — this ordering is
SEMANTIC: it spatializes diversity), project to ids + histogram columns,
globally normalize (M6), then run FPS per consecutive chunk of
``max_chunk_size_for_fps`` rows with per-chunk target
``ceil(len(chunk) · n/N)`` (O3/O4/O5), concatenating selections in chunk
order and truncating to n.

Ray-Data-first shape (no global sort materialization):
1. project EARLY to ids + feature columns — payloads never enter the shuffle;
2. M6 normalization: one partial-aggregation stats pass + one broadcast
   apply pass;
3. deterministic global positions: per-file_id counts (small groupby) →
   driver computes lexicographic cumulative offsets → broadcast → each
   group stamps pos = offset + local rank (sorted by patch_id). This
   reproduces the reference's (file_id, patch_id) sort order without a
   full range-partition sort;
4. chunk_id = pos // chunk_size; ``groupby(chunk_id).map_groups`` runs the
   numpy FPS kernel per chunk in parallel (the reference runs chunks
   serially — same result, since chunks are independent);
5. selections (small) are merged driver-side in (chunk_id, selection_order)
   order and truncated to n — byte-identical to the reference's
   concat + iloc[:n] ordering semantics.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..catalogue import PATCH_INFO
from ..stages.normalize import normalize_dataset
from .algos import fps
from .base import FILE_ID_COLNAME, PATCH_ID_COLNAME, Sampler
from ..stages.partitioning import pick_group_partitions


def assign_positions(ds, strata: str = FILE_ID_COLNAME, id_col: str = PATCH_ID_COLNAME,
                     pos_col: str = "__pos", counts: pd.DataFrame | None = None):
    """Stamp each row with its global rank under (strata, id) lexicographic
    order, via per-strata offsets (no full sort shuffle)."""
    from .algos import strata_counts

    if counts is None:
        counts = strata_counts(ds, strata)
    counts = counts.sort_values(strata, kind="mergesort")
    offsets = dict(
        zip(counts[strata], np.concatenate([[0], counts["n"].cumsum().to_numpy()[:-1]]))
    )
    off_ref = ray.put(offsets)

    def _stamp(group: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        g = group.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        g[pos_col] = offs[g[strata].iloc[0]] + np.arange(len(g), dtype=np.int64)
        return g

    return ds.groupby(strata, num_partitions=pick_group_partitions(ds)) \
             .map_groups(_stamp, batch_format="pandas")


class DiversitySampler(Sampler):
    def get_patches(self, catalogue, num_to_sample=None, **kw) -> pd.DataFrame:
        if num_to_sample is None:
            num_to_sample = self.cf["target_total_num_patches"]
        dcf = self.cf["DiversitySampler"]
        cols = list(dcf["columns"])
        max_chunk = int(dcf["max_chunk_size_for_fps"])

        from .algos import fps as fps_kernel, strata_counts

        ds = catalogue.select_columns(PATCH_INFO + cols)
        counts = strata_counts(ds, FILE_ID_COLNAME)  # shuffle-free scan
        total = int(counts["n"].sum())
        if total == 0:
            return pd.DataFrame(columns=self.sampling_schema)

        ds = normalize_dataset(
            ds, cols,
            normalization=dcf.get("normalization", "standardization"),
            n_quantiles=int(dcf.get("n_quantiles", 50)),
        )

        name = self.name
        cf = dict(self.cf)
        schema = self.sampling_schema
        target_proportion = num_to_sample / total
        single_chunk = total <= max_chunk

        if single_chunk:
            # Reference regime: one chunk ⇒ FPS on the driver over the
            # normalized projection (bounded by max_chunk rows — exactly
            # what the reference holds in RAM, diversity.py:78-84). Saves
            # the position-stamp and chunk-regroup shuffles entirely.
            g = ds.to_pandas().sort_values(
                [FILE_ID_COLNAME, PATCH_ID_COLNAME], kind="mergesort"
            ).reset_index(drop=True)
            idx = fps_kernel(g[cols].to_numpy(), min(num_to_sample, len(g)))
            sel = g.loc[idx, PATCH_INFO].reset_index(drop=True)
            sel["sampler"] = name
            sel = _val_split(sel, cf)
            self.log.info(f"{self.name} kept {len(sel)} rows of the {num_to_sample} requested")
            return sel[schema + [FILE_ID_COLNAME]]

        ds = assign_positions(ds, counts=counts)

        def _chunk_fps(group: pd.DataFrame) -> pd.DataFrame:
            g = group.sort_values("__pos", kind="mergesort").reset_index(drop=True)
            n_chunk = (
                num_to_sample if single_chunk else math.ceil(len(g) * target_proportion)
            )
            n_chunk = min(n_chunk, len(g))
            idx = fps(g[cols].to_numpy(), n_chunk)
            sel = g.loc[idx, PATCH_INFO + ["__pos"]].reset_index(drop=True)
            sel["sampler"] = name
            sel = _val_split(sel, cf)
            sel["__chunk"] = g["__pos"].iloc[0] // max_chunk
            sel["__order"] = np.arange(len(sel), dtype=np.int64)
            return sel[schema + [FILE_ID_COLNAME, "__chunk", "__order"]]

        def _add_chunk(batch: pa.Table) -> pa.Table:
            chunk = batch["__pos"].to_numpy(zero_copy_only=False) // max_chunk
            return batch.append_column("__chunk_id", pa.array(chunk))

        chunked = ds.map_batches(_add_chunk, batch_format="pyarrow", zero_copy_batch=True)
        selected = (
            chunked.groupby("__chunk_id",
                            num_partitions=pick_group_partitions(chunked))
            .map_groups(_chunk_fps, batch_format="pandas").to_pandas()
        )
        selected = (
            selected.sort_values(["__chunk", "__order"], kind="mergesort")
            .head(num_to_sample)
            .drop(columns=["__chunk", "__order"])
            .reset_index(drop=True)
        )
        self.log.info(f"{self.name} kept {min(num_to_sample, len(selected))} rows of the {num_to_sample} requested")
        return selected


def _val_split(patches: pd.DataFrame, cf: dict) -> pd.DataFrame:
    """O9 applied per chunk (reference diversity.py:92-93) — pure function so
    it can run inside map_groups workers."""
    from .base import SALT_VAL, sample_with_stratification_df

    patches["split"] = "test"
    if cf.get("frac_validation_set"):
        patches.loc[:, "split"] = "train"
        num_val = math.floor(cf["frac_validation_set"] * len(patches))
        val_ids = sample_with_stratification_df(
            patches, num_val, keys=FILE_ID_COLNAME, salt=SALT_VAL
        )[PATCH_ID_COLNAME]
        patches.loc[patches[PATCH_ID_COLNAME].isin(val_ids), "split"] = "val"
    return patches
