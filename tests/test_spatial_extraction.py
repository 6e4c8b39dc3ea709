"""Spatial join / kNN kernels + extraction resume semantics."""

import json
import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from pacasam_ray.catalogue import add_catalogue_columns
from pacasam_ray.pipelines.extraction import (
    check_sampling_format,
    list_completed,
    read_extracted,
    run_extraction,
)
from pacasam_ray.sources.pages import pages_from_documents
from pacasam_ray.stages.spatial import (
    _ZoneIndex,
    knn_brute,
    points_in_box,
    points_in_polygon,
    rect_zone,
)

from conftest import SF_DIR


def test_points_in_polygon_matches_box_on_rects():
    rng = np.random.default_rng(0)
    px = rng.uniform(0, 100, 2000)
    py = rng.uniform(0, 100, 2000)
    for xmin, ymin, xmax, ymax in [(10, 10, 40, 60), (0, 0, 100, 5), (55.5, 20.2, 90.9, 77.7)]:
        a = points_in_polygon(px, py, rect_zone(xmin, ymin, xmax, ymax))
        b = points_in_box(px, py, xmin, ymin, xmax, ymax)
        # ray casting excludes some boundary points; interior points agree
        interior = (px != xmin) & (px != xmax) & (py != ymin) & (py != ymax)
        assert (a[interior] == b[interior]).all()


def test_points_in_polygon_triangle():
    tri = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    px = np.array([1.0, 5.0, 9.0, 4.9, 5.1])
    py = np.array([1.0, 4.0, 9.0, 4.9, 5.1])
    assert points_in_polygon(px, py, tri).tolist() == [True, True, False, True, False]


def test_zone_index_priority_and_miss():
    zones = [rect_zone(0, 0, 10, 10), rect_zone(5, 5, 20, 20)]
    idx = _ZoneIndex(zones)
    px = np.array([6.0, 15.0, 50.0])
    py = np.array([6.0, 15.0, 50.0])
    assert idx.assign(px, py).tolist() == [0, 1, -1]  # overlap → first match


def test_knn_brute_matches_pandas():
    n = 500
    ids = np.arange(n, dtype=np.int64)
    rng = np.random.default_rng(1)
    x, y = rng.uniform(0, 1000, n), rng.uniform(0, 1000, n)
    ds = ray.data.from_arrow(pa.table({"patch_id": ids, "x": x, "y": y}))
    q = np.array([[100.0, 100.0], [900.0, 50.0]])
    got = knn_brute(ds, q, 7)
    for qi in range(2):
        d2 = (x - q[qi, 0]) ** 2 + (y - q[qi, 1]) ** 2
        expect = ids[np.lexsort((ids, d2))[:7]]
        assert got[got["query_id"] == qi]["patch_id"].tolist() == expect.tolist()


@pytest.fixture()
def sampling_ds():
    pages = pages_from_documents(SF_DIR)

    def _prep(t: pa.Table) -> pa.Table:
        t = add_catalogue_columns(t)
        return t.select(["url", "html", "doc_id", "file_id"]).append_column(
            "split", pa.array(["train"] * t.num_rows)
        ).append_column("patch_id", t["doc_id"])

    return pages.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)


def test_extraction_roundtrip_and_resume(sampling_ds, tmp_path, duck):
    root = tmp_path / "ds"
    summary = run_extraction(sampling_ds, root, num_shards=4)
    assert summary["rows_written"] == 500
    assert summary["partitions_written"] == len(list_completed(root))

    # per-row invariant: byte-identical text per url vs the source table
    out = read_extracted(root).sort_values("patch_id").reset_index(drop=True)
    src = duck.sql("SELECT doc_id, text FROM documents ORDER BY doc_id").df()
    assert out["text"].tolist() == src["text"].tolist()

    # full resume: nothing pending
    again = run_extraction(sampling_ds, root, num_shards=4)
    assert again["partitions_written"] == 0
    assert again["partitions_skipped"] == summary["partitions_written"]

    # partial resume: drop one partition's manifest + data → only it reruns
    victim = sorted((root / "_manifest").glob("*.json"))[0]
    m = json.loads(victim.read_text())
    Path(m["path"]).unlink()
    victim.unlink()
    third = run_extraction(sampling_ds, root, num_shards=4)
    assert third["partitions_written"] == 1
    assert read_extracted(root)["text"].sort_values().tolist() == src["text"].sort_values().tolist()


def test_check_sampling_format_negative():
    good = pa.schema([("url", pa.string()), ("split", pa.string()), ("html", pa.binary())])
    check_sampling_format(good)
    with pytest.raises(ValueError):
        check_sampling_format(pa.schema([("url", pa.string()), ("split", pa.string())]))
    with pytest.raises(TypeError):
        check_sampling_format(
            pa.schema([("url", pa.string()), ("split", pa.int64()), ("html", pa.binary())])
        )


def test_preflight_reports_truncated_missing_paths(tmp_path):
    """S7: missing inputs fail fast with an informative truncated listing;
    a fully-present input passes silently."""
    from pacasam_ray.pipelines.extraction import check_all_files_exist

    present = []
    for i in range(3):
        p = tmp_path / f"ok-{i}.bin"
        p.write_bytes(b"x")
        present.append(str(p))
    missing = [str(tmp_path / f"gone-{i:02d}.bin") for i in range(15)]

    ok_ds = ray.data.from_items([{"path": p} for p in present])
    check_all_files_exist(ok_ds, "path")  # no raise

    bad = ray.data.from_items(
        [{"path": p} for p in present + missing], override_num_blocks=4
    )
    with pytest.raises(FileNotFoundError) as ei:
        check_all_files_exist(bad, "path")
    msg = str(ei.value)
    assert "gone-" in msg and "..." in msg
    assert msg.count("gone-") <= 10
    assert "ok-0" not in msg


def test_slab_salting_spreads_hot_slab_and_preserves_roundtrip(tmp_path, duck):
    """A skewed input (every row in ONE slab) pins all work on one shard by
    default; slab_salt spreads it across shards deterministically without
    breaking the byte-identity invariant or the manifest layout."""
    pages = pages_from_documents(SF_DIR)

    def _one_slab(t: pa.Table) -> pa.Table:
        t = add_catalogue_columns(t)
        n = t.num_rows
        return pa.table({
            "url": t["url"], "html": t["html"],
            "doc_id": t["doc_id"], "patch_id": t["doc_id"],
            "file_id": pa.array(["hot-slab"] * n),
            "split": pa.array(["train"] * n),
        })

    ds = pages.map_batches(_one_slab, batch_format="pyarrow")

    flat_root = tmp_path / "flat"
    s1 = run_extraction(ds, flat_root, num_shards=8, slab_salt=1)
    assert s1["partitions_written"] == 1  # the skew: one giant partition

    salted_root = tmp_path / "salted"
    s4 = run_extraction(ds, salted_root, num_shards=8, slab_salt=4)
    assert s4["partitions_written"] > 1
    assert s4["rows_written"] == s1["rows_written"]

    out = read_extracted(salted_root).sort_values("patch_id").reset_index(drop=True)
    src = duck.sql("SELECT doc_id, text FROM documents ORDER BY doc_id").df()
    assert list(out["text"]) == list(src["text"])
