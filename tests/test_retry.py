"""Retrying fetch stage (T4): success-after-k-failures, backoff schedule,
per-attempt timeout, exhaustion policy — all with injected flaky callables
and a recorded fake sleep (no real waiting, no network)."""

import time

import pytest
import ray.data

from pacasam_ray.stages.retry import (
    FetchTimeoutError,
    RetryExhaustedError,
    RetryingFetcher,
    retry,
    retry_call,
)


class Flaky:
    def __init__(self, fail_times, exc=ConnectionError("boom")):
        self.fail_times = fail_times
        self.exc = exc
        self.calls = 0

    def __call__(self, x=None):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise self.exc
        return ("ok", x, self.calls)


def test_success_after_k_failures_with_backoff_schedule():
    slept = []
    fn = Flaky(fail_times=2)
    out = retry_call(fn, ("u",), attempts=7, delay=15, backoff=2,
                     sleep=slept.append)
    assert out == ("ok", "u", 3)
    assert slept == [15, 30]  # reference retry(7, 15, 2) schedule


def test_exhausted_raises_with_last_exception():
    slept = []
    fn = Flaky(fail_times=99)
    with pytest.raises(RetryExhaustedError) as ei:
        retry_call(fn, attempts=3, delay=1, backoff=3, sleep=slept.append)
    assert fn.calls == 3
    assert slept == [1, 3]
    assert isinstance(ei.value.last, ConnectionError)


def test_timeout_counts_as_failure_then_recovers():
    state = {"calls": 0}

    def slow_then_fast():
        state["calls"] += 1
        if state["calls"] == 1:
            time.sleep(0.5)
        return state["calls"]

    out = retry_call(slow_then_fast, attempts=3, delay=0, backoff=1,
                     timeout=0.1, sleep=lambda s: None)
    assert out == 2


def test_timeout_exhaustion_preserves_timeout_error():
    with pytest.raises(RetryExhaustedError) as ei:
        retry_call(lambda: time.sleep(0.5), attempts=2, delay=0, backoff=1,
                   timeout=0.05, sleep=lambda s: None)
    assert isinstance(ei.value.last, FetchTimeoutError)


def test_non_retryable_exception_propagates_immediately():
    fn = Flaky(fail_times=99, exc=TypeError("bug, not flake"))
    with pytest.raises(TypeError):
        retry_call(fn, attempts=5, delay=0, retry_on=(ConnectionError,),
                   sleep=lambda s: None)
    assert fn.calls == 1


def test_retry_decorator_matches_reference_shape():
    fn = Flaky(fail_times=1)
    wrapped = retry(7, 15, 2, sleep=lambda s: None)(fn)
    assert wrapped("x") == ("ok", "x", 2)


def make_flaky_factory():
    """Per-actor state: every item fails on its first attempt; item 13 is
    permanently dead. Built as a closure so cloudpickle ships it by value —
    Ray workers cannot import the test module."""

    def _flaky_factory():
        seen = {}

        def fetch(item):
            if item == 13:
                raise ConnectionError("permanently dead")
            seen[item] = seen.get(item, 0) + 1
            if seen[item] == 1:
                raise ConnectionError("first attempt always fails")
            return f"payload-{item}"

        return fetch

    return _flaky_factory


def test_fetcher_stage_null_policy_in_actor_pool():
    _flaky_factory = make_flaky_factory()
    ds = ray.data.range(20).map_batches(
        lambda b: {"url": b["id"]}, batch_format="numpy"
    ).map_batches(
        RetryingFetcher,
        fn_constructor_kwargs=dict(
            fetch_factory=_flaky_factory, item_col="url", out_col="payload",
            attempts=3, delay=0, backoff=1, on_exhausted="null",
            sleep=lambda s: None,
        ),
        concurrency=1, batch_size=8, batch_format="pyarrow",
    )
    out = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(out) == 20
    ok = out[out.url != 13]
    assert (ok["payload"] == ok["url"].map("payload-{}".format)).all()
    assert ok["payload_error"].isna().all()
    dead = out[out.url == 13].iloc[0]
    assert dead["payload"] is None or dead["payload"] != dead["payload"]
    assert "permanently dead" in dead["payload_error"]


def test_fetcher_stage_drop_policy():
    _flaky_factory = make_flaky_factory()
    ds = ray.data.range(6).map_batches(
        lambda b: {"url": b["id"]}, batch_format="numpy"
    ).map_batches(
        RetryingFetcher,
        fn_constructor_kwargs=dict(
            fetch_factory=_flaky_factory, item_col="url", out_col="payload",
            attempts=2, delay=0, backoff=1, on_exhausted="drop",
            sleep=lambda s: None,
        ),
        concurrency=1, batch_size=32, batch_format="pyarrow",
    )
    out = ds.to_pandas()
    assert sorted(out["url"]) == [0, 1, 2, 3, 4, 5]  # 13 not in range(6)
