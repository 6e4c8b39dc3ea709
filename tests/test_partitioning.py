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


def test_smallest_n_tree_reduce_matches_flat_on_many_blocks():
    """The second-level tree reduce must be a pure optimization: identical
    top-n on a 64-block input whether forced on or off, including rank
    ties."""
    import numpy as np

    from pacasam_ray.samplers.algos import smallest_n

    rows = [{"patch_id": i, "__r": int((i * 2654435761) % 997)} for i in range(5000)]
    ds = ray.data.from_items(rows, override_num_blocks=64)
    flat = smallest_n(ds, 100, col="__r", force_tree=False).to_pandas()
    tree = smallest_n(ds, 100, col="__r", force_tree=True).to_pandas()
    pd.testing.assert_frame_equal(
        flat.reset_index(drop=True), tree.reset_index(drop=True)
    )
    assert len(flat) == 100
    # deterministic: the result is the global (rank, id) bottom-100
    allr = pd.DataFrame(rows).sort_values(["__r", "patch_id"]).head(100)
    assert list(flat["patch_id"]) == list(allr["patch_id"])


def test_grouped_batch_map_one_callback_per_bucket():
    """High-group-cardinality reduce: callbacks scale with BUCKETS (nparts),
    not groups — every group lands whole in exactly one callback."""
    import numpy as np
    import pandas as pd
    import ray.data

    from pacasam_ray.stages.partitioning import grouped_batch_map

    n_groups, rows_per = 20_000, 3
    rows = [{"k": g, "v": g * rows_per + r}
            for g in range(n_groups) for r in range(rows_per)]
    ds = ray.data.from_items(rows, override_num_blocks=16)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        # one output row PER CALLBACK: row count of the result == #callbacks
        return pd.DataFrame({"n_groups": [df["k"].nunique()],
                             "n_rows": [len(df)]})

    out = grouped_batch_map(ds, ["k"], fn, nparts=8).to_pandas()
    assert len(out) <= 8, f"{len(out)} callbacks for 8 buckets"
    assert int(out["n_groups"].sum()) == n_groups  # each group seen once
    assert int(out["n_rows"].sum()) == n_groups * rows_per


def test_scrub_empty_blocks_drops_schema_less_poison():
    """groupby.map_groups / hash-aggregate chains emit zero-row blocks that
    can carry NO columns; those bypass map_batches UDFs and crash pyarrow
    hash joins. scrub_empty_blocks must remove every zero-row block and
    preserve the data exactly."""
    import numpy as np
    import ray.data

    from pacasam_ray.stages.partitioning import scrub_empty_blocks

    good = pd.DataFrame({"k": np.arange(5, dtype=np.int64),
                         "v": np.arange(5, dtype=np.int64) * 10})
    poison = pd.DataFrame()  # zero rows, zero columns
    ds = ray.data.from_pandas(good).union(ray.data.from_pandas(poison))
    clean = scrub_empty_blocks(ds)

    for bundle in clean.iter_internal_ref_bundles():
        for _ref, meta in bundle.blocks:
            assert meta.num_rows > 0, "scrub left a zero-row block"

    # the cleaned dataset joins fine and the data survived intact
    right = clean.map_batches(
        lambda t: t.rename_columns(["w", "v2"]), batch_format="pyarrow"
    )
    j = clean.join(right, join_type="inner", num_partitions=2,
                   on=("k",), right_on=("w",)).to_pandas()
    assert sorted(j["k"]) == list(range(5))
    assert sorted(j["v"]) == sorted(j["v2"])


def test_neardup_pair_producers_emit_no_empty_blocks():
    """The simhash/minhash pair pipelines end in map_groups→Min chains that
    used to leak schema-less empty blocks into the component-labeling joins
    (observed crash: 'No match ... FieldRef.Name(lab)' at sf0.01). Their
    outputs must be scrubbed at the source."""
    from pacasam_ray.functions.dedup import simhash_neardup_pairs

    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = simhash_neardup_pairs(docs, max_hamming=3)
    for bundle in pairs.materialize().iter_internal_ref_bundles():
        for _ref, meta in bundle.blocks:
            assert meta.num_rows > 0, "pair producer leaked a zero-row block"


def test_checkpoint_spills_to_parquet_above_threshold(tmp_path):
    """Multi-consumer intermediates pin in the object store when small and
    spill to partitioned parquet above the threshold; both paths must return
    the same rows and the spill path must actually write files."""
    import glob

    from pacasam_ray.stages.partitioning import checkpoint

    df = pd.DataFrame({"k": range(100), "v": [i * 3 for i in range(100)]})
    ds = ray.data.from_pandas(df).repartition(4)

    pinned = checkpoint(ds, tag="t", est_bytes=10, spill_threshold_bytes=1 << 40)
    spilled = checkpoint(ds, tag="t", est_bytes=10, spill_threshold_bytes=0)

    a = pinned.to_pandas().sort_values("k").reset_index(drop=True)
    b = spilled.to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert glob.glob("/tmp/pacasam_ckpt_t_*/*.parquet"), "spill wrote no files"


def test_ngram_jaccard_identical_through_spill_checkpoint(monkeypatch):
    """Force the gram-index checkpoint onto the parquet spill path (the
    100 TB configuration) and require bit-identical join output, capped and
    uncapped."""
    from pacasam_ray.functions.dedup import ngram_jaccard_pairs

    def run():
        ds = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        )
        exact = ngram_jaccard_pairs(ds, n=3, tau=0.5).to_pandas()
        capped = ngram_jaccard_pairs(ds, n=3, tau=0.5, max_doc_freq=50).to_pandas()
        key = ["doc_a", "doc_b"]
        return (exact.sort_values(key).reset_index(drop=True),
                capped.sort_values(key).reset_index(drop=True))

    monkeypatch.delenv("GRAFT_CHECKPOINT_SPILL_BYTES", raising=False)
    exact_mem, capped_mem = run()
    monkeypatch.setenv("GRAFT_CHECKPOINT_SPILL_BYTES", "0")
    exact_spill, capped_spill = run()

    pd.testing.assert_frame_equal(exact_mem, exact_spill)
    pd.testing.assert_frame_equal(capped_mem, capped_spill)
    assert len(exact_mem) > 0


def test_grouped_topk_high_cardinality_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data

    from pacasam_ray.stages.topk import grouped_topk

    rng = np.random.RandomState(7)
    n = 60_000
    df = pd.DataFrame({
        "g": rng.randint(0, 25_000, n),
        "s": rng.randint(0, 1_000_000, n),
        "id": np.arange(n),
    })
    ds = ray.data.from_pandas(df).repartition(16)
    got = grouped_topk(ds, ["g"], "s", 2, descending=True,
                       tiebreak=["id"]).to_pandas()
    want = (df.sort_values(["g", "s", "id"], ascending=[True, False, True],
                           kind="mergesort")
              .groupby("g", sort=False).head(2))
    got = got.sort_values(["g", "s", "id"],
                          ascending=[True, False, True]).reset_index(drop=True)
    want = want.sort_values(["g", "s", "id"],
                            ascending=[True, False, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["g", "s", "id"]], want[["g", "s", "id"]])


def test_grouped_prefix_sum_matches_pandas_scan():
    import numpy as np
    import pandas as pd
    import ray.data

    from pacasam_ray.stages.scan import grouped_prefix_sum

    rng = np.random.RandomState(11)
    n = 30_000
    df = pd.DataFrame({
        "g": rng.randint(0, 7, n).astype(str),      # few hot groups (skew)
        "o": rng.permutation(n * 3)[:n],            # sparse unique order keys
        "v": rng.randint(0, 50, n),
    })
    want = df.sort_values(["g", "o"], kind="mergesort")
    want = want.assign(prefix=want.groupby("g")["v"].cumsum() - want["v"])
    for nparts in (3, 17):
        ds = ray.data.from_pandas(df).repartition(nparts)
        got = grouped_prefix_sum(ds, "g", "o", "v").to_pandas()
        got = got.sort_values(["g", "o"], kind="mergesort")
        np.testing.assert_array_equal(
            got["prefix"].to_numpy(),
            want["prefix"].to_numpy(),
            err_msg=f"nparts={nparts}",
        )


def test_grouped_prefix_sum_single_group_many_buckets():
    import numpy as np
    import pandas as pd
    import ray.data

    from pacasam_ray.stages.scan import grouped_prefix_sum

    n = 5_000
    df = pd.DataFrame({"g": ["x"] * n,
                       "o": np.arange(n)[::-1].copy(),
                       "v": np.ones(n, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(8)
    got = grouped_prefix_sum(ds, "g", "o", "v",
                             target_buckets=64).to_pandas()
    got = got.sort_values("o", kind="mergesort")
    # one hot group split across 64 range buckets: prefix == order key
    np.testing.assert_array_equal(got["prefix"].to_numpy(),
                                  np.arange(n, dtype=np.int64))


def test_read_parquet_sized_blocks_follow_disk_bytes(tmp_path):
    import os

    import pandas as pd

    from pacasam_ray.io import READ_BLOCK_BYTES, read_parquet_sized

    p = tmp_path / "t.parquet"
    pd.DataFrame({"a": range(1000)}).to_parquet(p, index=False)
    ds = read_parquet_sized(str(p)).materialize()
    # tiny file -> the floor, never Ray's 2xCPU auto-split
    expected = max(4, -(-os.path.getsize(p) // READ_BLOCK_BYTES))
    assert ds.num_blocks() == expected == 4
    assert ds.count() == 1000
    # explicit override wins
    ds2 = read_parquet_sized(str(p), override_num_blocks=2).materialize()
    assert ds2.num_blocks() == 2


def test_broadcast_cap_join_paths_match_oracle(monkeypatch, duck):
    """Force the over-cap (distributed hash-join) plan of the queries that
    normally broadcast an sf-proportional dimension, and check the join
    plan is value-identical to the DuckDB oracle."""
    from pacasam_ray import queries as Q
    from test_oracle_parity import canonicalize, to_pandas
    from conftest import SF_DIR

    monkeypatch.setattr(Q, "DIM_BROADCAST_CAP_BYTES", 0)
    oracles = Q.build_oracle_sql()
    for name, fn in (("revenue_share", Q.q_revenue_share),
                     ("tpch_q5", Q.q_tpch_q5)):
        ray_df = canonicalize(to_pandas(fn(SF_DIR)))
        ora_df = canonicalize(duck.sql(oracles[name]).df())
        assert len(ray_df) == len(ora_df), name
        assert list(ray_df.columns) == list(ora_df.columns), name
        for c in ray_df.columns:
            a, b = ray_df[c], ora_df[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                pd.testing.assert_series_equal(
                    a.astype("float64"), b.astype("float64"),
                    check_names=False, rtol=0, atol=0, obj=f"{name}.{c}")
            else:
                assert list(a) == list(b), f"{name}.{c}"
