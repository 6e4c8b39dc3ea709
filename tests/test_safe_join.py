"""safe_join: empty-side degenerate results must match DuckDB join
semantics (with pyarrow's coalesce-keys column layout), and the non-empty
path must be byte-identical to Ray's native join."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from pacasam_ray.stages.joins import safe_join

L_SCHEMA = pa.schema([("k", pa.int64()), ("lv", pa.string())])
R_SCHEMA = pa.schema([("rk", pa.int64()), ("rv", pa.float64())])

L_ROWS = pa.table({"k": pa.array([1, 2, 2], pa.int64()),
                   "lv": pa.array(["a", "b", "c"])})
R_ROWS = pa.table({"rk": pa.array([2, 3], pa.int64()),
                   "rv": pa.array([20.0, 30.0])})
L_EMPTY = pa.table({"k": pa.array([], pa.int64()),
                    "lv": pa.array([], pa.string())})
R_EMPTY = pa.table({"rk": pa.array([], pa.int64()),
                    "rv": pa.array([], pa.float64())})

SQL = {
    "inner": "SELECT k, lv, rv FROM L JOIN R ON k = rk",
    "left_outer": "SELECT k, lv, rv FROM L LEFT JOIN R ON k = rk",
    "full_outer": "SELECT COALESCE(k, rk) AS k, lv, rv FROM L FULL JOIN R ON k = rk",
    "left_semi": "SELECT k, lv FROM L SEMI JOIN R ON k = rk",
    "left_anti": "SELECT k, lv FROM L ANTI JOIN R ON k = rk",
}


def _canon(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    return sorted(df.fillna("\x00").astype(str).values.tolist())


@pytest.mark.parametrize("join_type", list(SQL))
@pytest.mark.parametrize("lrows,rrows", [
    (L_ROWS, R_ROWS), (L_ROWS, R_EMPTY), (L_EMPTY, R_ROWS),
    (L_EMPTY, R_EMPTY),
])
def test_safe_join_matches_duckdb(ray_session, join_type, lrows, rrows):
    left = ray.data.from_arrow([lrows])
    right = ray.data.from_arrow([rrows])
    out_ds = safe_join(left, right, join_type=join_type, on=("k",),
                       right_on=("rk",), num_partitions=4)
    con = duckdb.connect()
    con.register("L", lrows)
    con.register("R", rrows)
    exp = con.sql(SQL[join_type]).df()
    con.close()
    # schema checked at the Dataset level: Ray 2.49's to_pandas drops the
    # schema of all-empty datasets (the schema_floor quirk), but any
    # downstream Ray stage still sees the typed blocks
    cols = out_ds.schema(fetch_if_missing=True).base_schema.names
    assert sorted(cols) == sorted(exp.columns), join_type
    out = out_ds.to_pandas()
    if len(exp):
        assert _canon(out) == _canon(exp), join_type
    else:
        assert len(out) == 0, join_type


def test_safe_join_schema_floor(ray_session):
    """A fully empty, schema-less side is typed through the floor."""
    schemaless = ray.data.from_arrow([R_EMPTY]).map_batches(
        lambda t: t, batch_format="pyarrow")
    left = ray.data.from_arrow([L_ROWS])
    out = safe_join(left, schemaless, join_type="left_outer", on=("k",),
                    right_on=("rk",), right_schema=R_SCHEMA).to_pandas()
    assert len(out) == 3 and out["rv"].isna().all()


def test_safe_join_survives_empty_first_block(ray_session):
    """The racy case: a typed EMPTY block ahead of real rows on one side
    (Ray's native join crashes when that block is submitted first)."""
    left = ray.data.from_arrow([L_EMPTY, L_ROWS])
    right = ray.data.from_arrow([R_EMPTY, R_ROWS])
    out = safe_join(left, right, join_type="inner", on=("k",),
                    right_on=("rk",), num_partitions=4).to_pandas()
    assert _canon(out) == _canon(pd.DataFrame(
        {"k": [2, 2], "lv": ["b", "c"], "rv": [20.0, 20.0]}))
