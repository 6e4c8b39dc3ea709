"""Size-derived shuffle partitioning: the helper's math, its metadata-only
estimation, and the invariance of shuffle results to the partition count."""

import pandas as pd
import pyarrow.compute as pc
import ray

from pacasam_ray.stages.partitioning import (
    MAX_PARTITIONS,
    MIN_PARTITIONS,
    TARGET_PARTITION_BYTES,
    estimated_size_bytes,
    pick_partitions,
)
from pacasam_ray.stages.dedup import dedup_exact

from conftest import SF_DIR


def test_pick_partitions_scales_with_bytes():
    assert pick_partitions(est_bytes=1) == MIN_PARTITIONS
    assert pick_partitions(est_bytes=TARGET_PARTITION_BYTES * 40) == 40
    # ceil, not floor: 40 partitions + 1 byte needs a 41st
    assert pick_partitions(est_bytes=TARGET_PARTITION_BYTES * 40 + 1) == 41
    assert pick_partitions(est_bytes=10**18) == MAX_PARTITIONS


def test_pick_partitions_unknown_size_falls_back_to_floor():
    ds = ray.data.from_items([{"a": 1}])  # no parquet metadata in lineage
    assert pick_partitions(ds) >= MIN_PARTITIONS


def test_estimated_size_is_metadata_only_and_walks_lineage():
    ds = ray.data.read_parquet(f"{SF_DIR}/lineitem.parquet")
    base = estimated_size_bytes(ds)
    assert base and base > 0
    # A transform erases the op's own metadata; the walk finds the read.
    mapped = ds.map_batches(lambda t: t, batch_format="pyarrow")
    assert estimated_size_bytes(mapped) == base
    # Join sums both branches.
    other = ray.data.read_parquet(f"{SF_DIR}/orders.parquet")
    both = pick_partitions(ds, other)
    assert both >= MIN_PARTITIONS
    # Nothing above triggered execution: no snapshot was materialized.
    assert "snapshot_operator=None" in str(mapped._plan)


def test_shuffle_result_invariant_to_partition_count():
    def run(nparts):
        ds = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "n_chars"]
        ).map_batches(
            lambda t: t.append_column("k", pc.cast(pc.bit_wise_and(t["doc_id"], 15), "int64")),
            batch_format="pyarrow",
        )
        out = dedup_exact(ds, "k", "doc_id", num_partitions=nparts).to_pandas()
        return out.sort_values(["k"]).reset_index(drop=True)

    a, b = run(2), run(7)
    pd.testing.assert_frame_equal(a, b)
