"""CLI entry point 2 — extraction (reference: src/pacasam/run_extraction.py).

    python -m pacasam_ray.run_extraction \
        --sampling_path /tmp/out/TripleSampler-ParquetConnector-any.parquet \
        --pages_dir /root/testdata/sf0.001 \
        --dataset_root_path /tmp/dataset \
        --num_shards 16

Lifecycle (reference run_extraction.py:44-77): load + validate the sampling
(S6) → extractor from registry → group patches by source unit (E1) →
per-partition atomic extraction with manifest-last publish (E2/E6) —
resumable: a re-run processes only partitions without a manifest.

The reference's sampling gpkg carries ``file_path`` pointers into the source
LAZ files; our sampling parquet carries ``patch_id``/``file_id`` pointers
into the page table, so extraction re-joins payload columns (url, html) late
by id (SURVEY §7.4.7) via a broadcast of the small selection — shuffles never
move ``html``.
"""

from __future__ import annotations

from .io import read_parquet_sized

import argparse
import logging
import sys
from pathlib import Path

log = logging.getLogger("pacasam_ray")


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--sampling_path", required=True,
                   help="sampling parquet written by run_sampling")
    p.add_argument("--pages_dir", required=True,
                   help="directory holding documents.parquet (payload source)")
    p.add_argument("--dataset_root_path", required=True)
    p.add_argument("--extractor_class", default="TextExtractor",
                   choices=["TextExtractor"])
    p.add_argument("--num_shards", type=int, default=16,
                   help="output partitions (per-shard atomic parquet + manifest)")
    p.add_argument("--slab_salt", type=int, default=1,
                   help="spread each slab over up to this many shards "
                        "(use >1 when slab sizes are heavily skewed)")
    return p


def run(args: argparse.Namespace) -> dict:
    import ray

    from .connectors import attach_pages
    from .pipelines.extraction import run_extraction

    selection = read_parquet_sized(
        args.sampling_path, columns=["patch_id", "split", "sampler"]
    ).to_pandas()
    # CopySampler stamps split=None; fill per-row (a PARTIALLY-null split
    # must not let the resume filter's binary_join drop those rows).
    selection = selection.assign(split=selection["split"].fillna("train"))
    sampling_ds = attach_pages(selection, args.pages_dir)
    summary = run_extraction(sampling_ds, args.dataset_root_path,
                             num_shards=args.num_shards, slab_salt=args.slab_salt)
    log.info("extraction summary: %s", summary)
    return summary


def main(argv: list[str] | None = None) -> dict:
    args = make_parser().parse_args(argv)
    return run(args)


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        main(sys.argv[1:])
    finally:
        ray.shutdown()
