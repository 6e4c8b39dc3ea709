"""run_extraction — the materialization pipeline, resumable per partition.

Reference (src/pacasam/run_extraction.py + extractors/): load + validate the
sampling (S6), group patches by source file (E1), extract each patch's bytes
(E2: closed-bounds bbox crop of the cloud; engine analog: byte-slice of the
``html`` payload back to ``text``), write atomically (tmpfile → rename), and
resume by skipping outputs that already exist (E6,
extractors/laz.py:103-104, CHANGELOG.md:41-43).

Engine layout ("resumable from checkpoint with per-partition lineage",
BASELINE.json north_rule):

    dataset_root/
      {split}/part-{shard:05d}.parquet      one file per (split, shard)
      _manifest/{split}-{shard:05d}.json    lineage + counts, written LAST

A shard is ``hash(file_id) % num_shards`` — co-locating each slab's patches
like the reference's per-file work units. A run first reads the manifest
directory, then processes ONLY pending (split, shard) partitions via
``groupby`` + per-group atomic writes; a crashed run reprocesses at most the
partitions without a manifest entry. The manifest is written after the data
file rename, so a partition is either fully present or fully pending.

Per-row invariant (BASELINE.json input_hint): the extracted ``text`` bytes
are identical per ``url`` across runs and parallelism levels.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..hashing import hmix
from ..sources.pages import extract_text_from_html
from ..stages.partitioning import pick_group_partitions

SAMPLING_REQUIRED = {"url": pa.string(), "split": pa.string(), "html": pa.binary()}


def check_sampling_format(schema: pa.Schema) -> None:
    """S6 `check_sampling_format` (extractors/extractor.py:51-73): fail fast
    on missing/mistyped mandatory columns."""
    for name, typ in SAMPLING_REQUIRED.items():
        if name not in schema.names:
            raise ValueError(f"sampling is missing mandatory column {name!r}")
        actual = schema.field(name).type
        if name == "html":
            ok = pa.types.is_binary(actual) or pa.types.is_large_binary(actual)
        else:
            ok = pa.types.is_string(actual) or pa.types.is_large_string(actual)
        if not ok:
            raise TypeError(f"sampling column {name!r} has type {actual}, expected {typ}")


def check_all_files_exist(ds, path_col: str, max_report: int = 10) -> None:
    """S7 preflight (reference ``check_all_files_exist`` +
    ``raise_explicit_FileNotFoundError``, extractors/extractor.py:76-87):
    validate that every input path exists BEFORE any extraction work runs,
    and fail with an informative, truncated list of the missing ones.

    Distributed: each batch stats its own paths (metadata-only work fanned
    out across workers) and ships back ONLY the missing ones; the driver
    pulls at most ``max_report + 1`` rows (limit short-circuits the scan),
    so a preflight over 10^9 paths costs one streaming pass and O(1)
    driver memory.
    """

    def _missing(t: pa.Table) -> pa.Table:
        miss = [p for p in t[path_col].to_pylist() if not Path(p).exists()]
        return pa.table({"missing": pa.array(miss, pa.string())})

    found = (
        ds.map_batches(_missing, batch_format="pyarrow")
        .limit(max_report + 1)
        .to_pandas()
    )
    if len(found):
        paths = found["missing"].tolist()
        if len(paths) > max_report:
            paths = paths[:max_report] + ["..."]
        listing = "\n".join(paths)
        raise FileNotFoundError(
            f"Expected files to exist and be accessible: \n{listing}"
        )


def _shard_of(file_ids: pd.Series, num_shards: int,
              patch_ids: np.ndarray | None = None,
              slab_salt: int = 1) -> np.ndarray:
    # hash the slab key string deterministically (python hash is salted; use
    # a stable fold over bytes)
    def fold(s: str) -> int:
        acc = 0
        for ch in s.encode():
            acc = (acc * 131 + ch) % 1_000_000_007
        return acc

    # Slab keys repeat heavily within a batch (thousands of patches per
    # slab), so fold only the uniques and scatter — the per-row Python
    # byte loop this replaces was the map-stage bottleneck of the
    # materialization pipeline on wide inputs.
    codes, uniq = pd.factorize(file_ids.to_numpy(), sort=False)
    ufold = np.fromiter((fold(s) for s in uniq), dtype=np.int64,
                        count=len(uniq))
    folded = ufold[codes] if len(uniq) else np.zeros(0, dtype=np.int64)
    if slab_salt > 1 and patch_ids is not None:
        # Hot-slab salting: spread each slab across up to ``slab_salt``
        # shards (deterministic in patch_id), so one giant slab cannot pin
        # a whole partition's work on one reducer. Costs up to slab_salt×
        # more output files per slab — use when slab sizes are skewed.
        folded = folded * np.int64(slab_salt) + (
            patch_ids.astype(np.int64) % slab_salt
        )
    return hmix(folded, 97) % num_shards


def list_completed(dataset_root: str | Path) -> set[tuple[str, int]]:
    mdir = Path(dataset_root) / "_manifest"
    done = set()
    if mdir.is_dir():
        for f in mdir.glob("*.json"):
            split, shard = f.stem.rsplit("-", 1)
            done.add((split, int(shard)))
    return done


def run_extraction(sampling_ds, dataset_root: str | Path, num_shards: int = 16,
                   slab_salt: int = 1) -> dict:
    """Extract all pending partitions. Returns a summary dict.

    ``sampling_ds``: Dataset with at least (url, split, html, file_id).
    ``slab_salt`` > 1 spreads each slab over up to that many shards
    (see ``_shard_of``) — set it when slab sizes are heavily skewed.
    """
    root = Path(dataset_root)
    (root / "_manifest").mkdir(parents=True, exist_ok=True)
    check_sampling_format(sampling_ds.schema().base_schema)

    done = list_completed(root)

    def _add_shard(batch: pa.Table) -> pa.Table:
        pids = (batch["patch_id"].to_numpy(zero_copy_only=False)
                if "patch_id" in batch.column_names else None)
        shard = _shard_of(
            pd.Series(np.asarray(batch["file_id"]).astype(object)), num_shards,
            patch_ids=pids, slab_salt=slab_salt,
        )
        return batch.append_column("__shard", pa.array(shard))

    sharded = sampling_ds.map_batches(_add_shard, batch_format="pyarrow", zero_copy_batch=True)

    if done:
        done_keys = pa.array([f"{s}-{i:05d}" for s, i in done])

        def _pending(batch: pa.Table) -> pa.Table:
            key = pc.binary_join_element_wise(
                batch["split"],
                pc.utf8_lpad(pc.cast(batch["__shard"], pa.string()), 5, "0"),
                "-",
            )
            return batch.filter(pc.invert(pc.is_in(key, value_set=done_keys)))

        sharded = sharded.map_batches(_pending, batch_format="pyarrow", zero_copy_batch=True)

    root_str = str(root)

    def _extract(batch: pa.Table) -> pa.Table:
        """E2 BEFORE the shuffle: the extraction map is row-wise and
        deterministic per url, so it runs in the embarrassingly-parallel
        read stage and the raw ``html`` payload NEVER crosses the
        (split, shard) exchange — only the (much smaller) extracted text
        does (SURVEY §7.4(7): keep payload columns out of shuffles).
        ``__src_bytes`` carries the dropped payload size so the manifest
        can report the measured shuffle-bytes saving."""
        html = batch["html"]
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        text = pc.cast(extract_text_from_html(html), pa.string())
        src_bytes = pc.cast(pc.binary_length(html), pa.int64())
        cols = {
            "url": batch["url"],
            "patch_id": batch["patch_id"] if "patch_id" in batch.column_names
            else pa.array([0] * batch.num_rows, type=pa.int64()),
            "split": batch["split"],
            "text": text,
            "__shard": batch["__shard"],
            "__src_bytes": src_bytes,
        }
        return pa.table(cols)

    extracted = sharded.map_batches(_extract, batch_format="pyarrow",
                                    zero_copy_batch=True)

    def _write_partition(group: pd.DataFrame) -> pd.DataFrame:
        """E6 per (split, shard): atomic publish, manifest-last. Runs on
        workers; one group = one output partition."""
        t_start = time.time()
        split = group["split"].iloc[0]
        shard = int(group["__shard"].iloc[0])
        group = group.sort_values("url", kind="mergesort")
        text = pa.array(group["text"].tolist(), type=pa.string())
        out = pa.table({
            "url": pa.array(group["url"].tolist(), type=pa.string()),
            "patch_id": pa.array(group["patch_id"].tolist(), type=pa.int64()),
            "split": pa.array(group["split"].tolist(), type=pa.string()),
            "text": text,
        })
        part_dir = Path(root_str) / str(split)
        part_dir.mkdir(parents=True, exist_ok=True)
        final = part_dir / f"part-{shard:05d}.parquet"
        tmp = final.with_suffix(".parquet.tmp")
        pq.write_table(out, tmp)
        os.replace(tmp, final)  # atomic publish (reference: tmpfile→copy)
        shuffled_payload = int(group["text"].str.len().sum())
        manifest = {
            "split": str(split),
            "shard": shard,
            "rows": int(len(group)),
            "bytes": int(final.stat().st_size),
            "path": str(final),
            "lineage": {"source": "sampling", "num_shards": num_shards},
            "written_at": time.time(),
            # per-partition throughput metrics (north rule: checkpoints with
            # lineage + throughput metrics for resumability)
            "elapsed_s": round(time.time() - t_start, 4),
            "rows_per_sec": round(len(group) / max(time.time() - t_start, 1e-9), 1),
            # measured exchange saving: raw payload bytes that stayed in the
            # map stage vs extracted bytes that crossed the shuffle
            "source_payload_bytes": int(group["__src_bytes"].sum()),
            "shuffled_payload_bytes": shuffled_payload,
        }
        mfinal = Path(root_str) / "_manifest" / f"{split}-{shard:05d}.json"
        mtmp = mfinal.with_suffix(".json.tmp")
        mtmp.write_text(json.dumps(manifest))
        os.replace(mtmp, mfinal)
        return pd.DataFrame(
            {"split": [str(split)], "shard": [shard], "rows": [len(group)]}
        )

    written = (
        extracted.groupby(["split", "__shard"],
                          num_partitions=pick_group_partitions(extracted))
        .map_groups(_write_partition, batch_format="pandas")
        .to_pandas()
    )
    return {
        "partitions_written": len(written),
        "rows_written": int(written["rows"].sum()) if len(written) else 0,
        "partitions_skipped": len(done),
        "dataset_root": str(root),
    }


def read_extracted(dataset_root: str | Path) -> pd.DataFrame:
    """Small-scale helper for tests: load every extracted partition."""
    root = Path(dataset_root)
    parts = sorted(root.glob("*/part-*.parquet"))
    if not parts:
        return pd.DataFrame(columns=["url", "patch_id", "split", "text"])
    return pd.concat([pq.read_table(p).to_pandas() for p in parts], ignore_index=True)
