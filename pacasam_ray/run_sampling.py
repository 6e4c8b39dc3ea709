"""CLI entry point 1 — sampling (reference: src/pacasam/run_sampling.py).

Mirrors the reference's surface exactly:

    python -m pacasam_ray.run_sampling \
        --config_file configs/synthetic.yml \
        --connector_class SyntheticConnector \
        --sampler_class TripleSampler \
        --output_path /tmp/out

Lifecycle (reference run_sampling.py:36-67): load YAML config → copy it into
the output dir → connector from registry → sampler from registry →
``sampler.get_patches`` → enrich selection by join back to the catalogue
(J1) → Parquet sink (S5: per-block files under a directory, atomic-ish via
write-then-rename of the directory is unnecessary since the sink is a fresh
dir per run) → stats CSVs (S8, analysis/stats.py:21-50).

The output file name mirrors the reference's
``{SamplerName}-{ConnectorName}-{split}.gpkg`` (run_sampling.py:45-47) with
Parquet instead of GeoPackage.
"""

from __future__ import annotations

from .io import read_parquet_sized

import argparse
import logging
import shutil
import sys
from pathlib import Path

log = logging.getLogger("pacasam_ray")


def load_config(path: str | None) -> dict:
    if not path:
        return {}
    import yaml

    with open(path) as f:
        return yaml.safe_load(f) or {}


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--config_file", default=None, help="YAML sampling config")
    p.add_argument("--connector_class", default="SyntheticConnector")
    p.add_argument("--sampler_class", default="TripleSampler")
    p.add_argument("--output_path", required=True)
    p.add_argument("--split", default="any", choices=["any", "train", "test"])
    p.add_argument("--make_stats", action=argparse.BooleanOptionalAction,
                   default=True, help="write the stats CSVs (--no-make_stats to skip)")
    return p


def run(args: argparse.Namespace) -> Path:
    import ray

    from .connectors import CONNECTORS_LIBRARY
    from .pipelines.sampling import DEFAULT_CONFIG, extract_selection
    from .pipelines.stats import Comparer
    from .samplers import SAMPLERS_LIBRARY

    cf = {**DEFAULT_CONFIG, **load_config(args.config_file)}

    out_dir = Path(args.output_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    if args.config_file:
        shutil.copy(args.config_file, out_dir)  # run_sampling.py:43-44

    connector_kwargs = dict(cf.get("connector_kwargs", {}))
    connector = CONNECTORS_LIBRARY[args.connector_class](
        split=args.split, **connector_kwargs
    )
    catalogue = connector.get_catalogue()

    sampler = SAMPLERS_LIBRARY[args.sampler_class](sampling_config=cf, log=log)
    selection = sampler.get_patches(catalogue)

    enriched = extract_selection(catalogue, selection)
    sampling_path = out_dir / f"{args.sampler_class}-{args.connector_class}-{args.split}.parquet"
    if sampling_path.exists():
        shutil.rmtree(sampling_path, ignore_errors=True)
    enriched.write_parquet(str(sampling_path))
    log.info("sampling written to %s (%d patches)", sampling_path, len(selection))

    if args.make_stats:
        sampling_ds = read_parquet_sized(str(sampling_path))
        Comparer(out_dir / "stats").compare(catalogue, sampling_ds)
    return sampling_path


def main(argv: list[str] | None = None) -> Path:
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
