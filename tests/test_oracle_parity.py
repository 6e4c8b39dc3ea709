"""Mirror of the driver's correctness gate: every oracle-backed query runs
as a Ray pipeline AND as DuckDB SQL on the same parquet, then row counts and
order-insensitive values are compared (columns sorted by name)."""

import pandas as pd
import pytest

from pacasam_ray.queries import build_oracle_sql, build_queries

from conftest import SF_DIR

ORACLES = build_oracle_sql()
QUERIES = build_queries()


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, duck):
    ray_df = canonicalize(to_pandas(QUERIES[name](SF_DIR)))
    ora_df = canonicalize(duck.sql(ORACLES[name]).df())
    assert len(ray_df) == len(ora_df), f"{name}: row count {len(ray_df)} != {len(ora_df)}"
    assert list(ray_df.columns) == list(ora_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(ora_df.columns)}"
    )
    for c in ray_df.columns:
        a, b = ray_df[c], ora_df[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            pd.testing.assert_series_equal(
                a.astype("float64"), b.astype("float64"), check_names=False,
                rtol=0, atol=0, obj=f"{name}.{c}",
            )
        else:
            try:
                same = a.reset_index(drop=True).astype(object).where(a.notna(), None).equals(
                    b.reset_index(drop=True).astype(object).where(b.notna(), None)
                )
            except Exception:
                same = list(a) == list(b)
            assert same, f"{name}.{c}: values differ"
