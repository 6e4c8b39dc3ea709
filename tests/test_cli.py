"""CLI round-trip: run_sampling → run_extraction, the reference's two entry
points (run_sampling.py / run_extraction.py), resumable and byte-identical.
"""

import json
from pathlib import Path

import duckdb
import pandas as pd
import pytest

from pacasam_ray import run_extraction as cli_extract
from pacasam_ray import run_sampling as cli_sample
from pacasam_ray.connectors import CONNECTORS_LIBRARY

from conftest import SF_DIR


@pytest.fixture(scope="module")
def sampling_out(tmp_path_factory, parquet_db_path):
    out = tmp_path_factory.mktemp("cli_sampling")
    path = cli_sample.main([
        "--config_file", str(Path(__file__).resolve().parents[1] / "configs" / "synthetic.yml"),
        "--connector_class", "ParquetConnector",
        "--sampler_class", "RandomSampler",
        "--output_path", str(out),
        "--split", "any",
    ])
    return out, path


@pytest.fixture(autouse=True, scope="module")
def parquet_db_path():
    orig = CONNECTORS_LIBRARY["ParquetConnector"]
    CONNECTORS_LIBRARY["ParquetConnector"] = (
        lambda split="any", **kw: orig(split=split, **{"db_path": SF_DIR, **kw})
    )
    yield
    CONNECTORS_LIBRARY["ParquetConnector"] = orig


def test_run_sampling_outputs(sampling_out):
    out, path = sampling_out
    assert path.exists()
    df = pd.read_parquet(path)
    assert len(df) == 50  # target_total_num_patches
    for col in ("patch_id", "split", "sampler", "file_id"):
        assert col in df.columns
    assert set(df["sampler"]) == {"RandomSampler"}
    assert (out / "synthetic.yml").exists()          # config copied into output
    stats = list((out / "stats").glob("*.csv"))
    assert stats, "Comparer wrote no CSVs"


def test_run_extraction_roundtrip_and_resume(sampling_out, tmp_path):
    out, path = sampling_out
    root = tmp_path / "dataset"
    summary = cli_extract.main([
        "--sampling_path", str(path),
        "--pages_dir", SF_DIR,
        "--dataset_root_path", str(root),
        "--num_shards", "4",
    ])
    assert summary["partitions_written"] > 0

    parts = sorted(root.glob("*/part-*.parquet"))
    manifests = sorted((root / "_manifest").glob("*.json"))
    assert len(parts) == len(manifests) == summary["partitions_written"]
    lineage = json.loads(manifests[0].read_text())
    assert {"split", "shard", "rows", "bytes", "path", "lineage",
            "elapsed_s", "rows_per_sec"} <= set(lineage)

    # per-row invariant: byte-identical text per url vs the source documents
    got = pd.concat([pd.read_parquet(p) for p in parts]).sort_values("patch_id")
    src = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).df().set_index("doc_id")["text"]
    assert len(got) == 50
    for pid, text in zip(got["patch_id"], got["text"]):
        assert text.encode() == src.loc[pid].encode()

    # resume: a second run skips every finished partition
    summary2 = cli_extract.main([
        "--sampling_path", str(path),
        "--pages_dir", SF_DIR,
        "--dataset_root_path", str(root),
        "--num_shards", "4",
    ])
    assert summary2["partitions_written"] == 0


def test_sampling_connector_resamples(sampling_out, tmp_path):
    out, path = sampling_out
    conn = CONNECTORS_LIBRARY["ParquetSamplingConnector"](db_path=str(path))
    ds = conn.get_catalogue()
    names = ds.schema().names
    assert "split" not in names and "sampler" not in names
    assert ds.count() == 50


def test_no_make_stats_flag_skips_csvs(tmp_path):
    out = tmp_path / "nostats"
    path = cli_sample.main([
        "--config_file", str(Path(__file__).resolve().parents[1] / "configs" / "synthetic.yml"),
        "--connector_class", "ParquetConnector",
        "--sampler_class", "RandomSampler",
        "--output_path", str(out),
        "--split", "any",
        "--no-make_stats",
    ])
    assert path.exists()
    stats_dir = out / "stats"
    assert not stats_dir.exists() or not list(stats_dir.glob("*.csv"))
