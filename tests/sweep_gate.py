"""Driver-gate mimic: run the FIRST-50 registry entries at sf0.01 (the
driver's correctness scale) against their DuckDB oracles, comparing row
count, column names, and order-insensitive values — the same contract as
CORRECTNESS_r{N}.json. Run manually: python tests/sweep_gate.py [sf_dir] [n].
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> str | None:
    if len(ray_df) != len(ora_df):
        return f"rows {len(ray_df)} != {len(ora_df)}"
    if list(ray_df.columns) != list(ora_df.columns):
        return f"cols {list(ray_df.columns)} != {list(ora_df.columns)}"
    for c in ray_df.columns:
        a, b = ray_df[c], ora_df[c]
        # Dtype-KIND strict, like the driver's canonical hash: an int64
        # engine column vs a float64 oracle column hashes differently even
        # when every value is equal (the r4 tpch_q12 red row). Catch the
        # class here so the mimic can never pass what the driver fails.
        if a.dtype.kind != b.dtype.kind and not (
                a.dtype.kind in "OU" and b.dtype.kind in "OU"):
            return f"dtype kind differs in {c}: {a.dtype} vs {b.dtype}"
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            if not (a.astype("float64").fillna(-1) == b.astype("float64").fillna(-1)).all():
                return f"values differ in {c}"
        else:
            av = a.astype(object).where(a.notna(), None).tolist()
            bv = b.astype(object).where(b.notna(), None).tolist()
            if av != bv:
                return f"values differ in {c}"
    return None


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_check = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    from pacasam_ray.queries import build_oracle_sql, build_queries

    queries = build_queries()
    oracles = build_oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results, n_fail = {}, 0
    for name in list(queries)[:n_check]:
        t0 = time.time()
        try:
            r = queries[name](sf_dir)
            ray_df = r if isinstance(r, pd.DataFrame) else r.to_pandas()
            if name in oracles:
                ora_df = con.sql(oracles[name]).df()
                err = compare(canonicalize(ray_df), canonicalize(ora_df))
            else:
                err = None if len(ray_df) >= 0 else "no rows"
        except Exception as e:  # noqa: BLE001 - sweep must report, not die
            err = f"{type(e).__name__}: {e}"[:300]
        sec = round(time.time() - t0, 2)
        results[name] = {"err": err, "sec": sec,
                         "oracle": name in oracles}
        if err:
            n_fail += 1
        print(f"{'FAIL' if err else 'ok':4s} {name:32s} {sec:7.2f}s "
              f"{err or ''}", flush=True)
    print(json.dumps({"checked": len(results), "failed": n_fail}))
    ray.shutdown()


if __name__ == "__main__":
    main()
