"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ..., "num_cpus": N, ...extras}.

--scaling: runs the headline pipeline twice in fresh processes at
num_cpus=8 and num_cpus=32 on the same input and reports throughput at both
plus the scaling efficiency (north rule: ≥0.8 from N to 4N parallelism).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "tile_assign",
    "extract_text",
    "dedup_exact",
    "stratified_sample",
    "normalize_std",
    "tpch_q1",
    "join_revenue",
    "events_window",
    "sampler_DiversitySampler",
    "sampler_TripleSampler",
]


def consume(result) -> int:
    """Drive a lazy Dataset to completion without materializing on the driver."""
    import pandas as pd

    if isinstance(result, pd.DataFrame):
        return len(result)
    n = 0
    for batch in result.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n += batch.num_rows
    return n


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    ray.data.DataContext.get_current().execution_options.verbose_progress = False

    from pacasam_ray.queries import build_queries

    queries = build_queries()

    # warm the OS page cache (untimed) so we measure compute+shuffle, not disk
    consume(queries["tile_assign"](SF_DIR))
    n_docs = consume(queries["tile_assign"](SF_DIR))

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        consume(queries[name](SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "headline_pipeline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs_per_sec_tile_assign": round(n_docs / max(timings["tile_assign"], 1e-9), 1),
        "n_docs": n_docs,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def run_at(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run_at(lo), run_at(hi)
    thr_lo = r_lo["n_docs"] / r_lo["value"]
    thr_hi = r_hi["n_docs"] / r_hi["value"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "throughput_docs_per_sec_8": round(thr_lo, 1),
        "throughput_docs_per_sec_32": round(thr_hi, 1),
        "queries_8": r_lo["queries"],
        "queries_32": r_hi["queries"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
