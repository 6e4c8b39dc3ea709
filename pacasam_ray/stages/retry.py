"""Retrying fetch stage (T4) — app-level retry/backoff/timeout for flaky
per-item work inside an actor pool.

Reference semantics: WMS downloads are wrapped in ``retry(7, 15, 2)`` (7
attempts, 15 s initial delay, ×2 exponential backoff) with a 300 s request
timeout (src/pacasam/extractors/bd_ortho_today.py:38,67-77). Ray's own
task-level ``max_retries`` re-runs the WHOLE task on worker death; a fetch
pipeline additionally needs *application-level* retries per item, inside
the actor, so one 404-then-OK URL doesn't re-fetch the other 4095 items in
its batch.

``retry_call``/``retry`` give the bare decorator; ``RetryingFetcher`` is
the map_batches stage shape: the (possibly expensive) fetch callable and
its thread-pool are built once per actor in ``__init__``, each item of the
input column is fetched with independent retry + timeout in ``__call__``.
"""

from __future__ import annotations

import concurrent.futures
import time
from typing import Any, Callable, Iterable

import pyarrow as pa


class RetryExhaustedError(RuntimeError):
    """All attempts failed; carries the last underlying exception."""

    def __init__(self, item: Any, attempts: int, last: BaseException):
        super().__init__(
            f"fetch failed after {attempts} attempts for item {item!r}: {last!r}"
        )
        self.item = item
        self.attempts = attempts
        self.last = last


class FetchTimeoutError(TimeoutError):
    """A single attempt exceeded the per-call timeout."""


def retry_call(
    fn: Callable[..., Any],
    args: tuple = (),
    kwargs: dict | None = None,
    *,
    attempts: int = 7,
    delay: float = 15.0,
    backoff: float = 2.0,
    timeout: float | None = None,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
    executor: concurrent.futures.ThreadPoolExecutor | None = None,
) -> Any:
    """Call ``fn`` with up to ``attempts`` tries, exponential backoff
    (``delay``, ``delay*backoff``, ...) between failures, and an optional
    per-attempt ``timeout`` (seconds). A timed-out attempt counts as a
    failure and is retried like any other.

    ``sleep`` and ``executor`` are injectable for tests (no real waiting)
    and for reuse of one thread pool across many calls (RetryingFetcher).
    Only ``retry_on`` exceptions are retried — programming errors
    (TypeError, KeyboardInterrupt, ...) propagate immediately when they
    fall outside the tuple.
    """
    kwargs = kwargs or {}
    own_executor = None
    if timeout is not None and executor is None:
        # One worker per potential attempt: a timed-out call's thread keeps
        # running (Python threads can't be killed), and must not block the
        # next attempt from starting.
        own_executor = executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=attempts
        )
    try:
        wait = delay
        last: BaseException | None = None
        for attempt in range(attempts):
            if attempt:
                sleep(wait)
                wait *= backoff
            try:
                if timeout is None:
                    return fn(*args, **kwargs)
                fut = executor.submit(fn, *args, **kwargs)
                try:
                    return fut.result(timeout=timeout)
                except concurrent.futures.TimeoutError as exc:
                    fut.cancel()
                    raise FetchTimeoutError(
                        f"attempt {attempt + 1} exceeded {timeout}s"
                    ) from exc
            except retry_on as exc:
                last = exc
            except FetchTimeoutError as exc:
                last = exc
        raise RetryExhaustedError((args, kwargs), attempts, last)
    finally:
        if own_executor is not None:
            own_executor.shutdown(wait=False)


def retry(attempts: int = 7, delay: float = 15.0, backoff: float = 2.0,
          timeout: float | None = None, **kw):
    """Decorator twin of ``retry_call`` — ``retry(7, 15, 2)(download)(url)``
    mirrors the reference call shape."""

    def _wrap(fn):
        def _inner(*args, **kwargs):
            return retry_call(fn, args, kwargs, attempts=attempts, delay=delay,
                              backoff=backoff, timeout=timeout, **kw)

        return _inner

    return _wrap


class RetryingFetcher:
    """Actor-pool map_batches stage: per-item fetch with independent retry.

    Usage::

        ds.map_batches(
            RetryingFetcher, fn_constructor_kwargs=dict(
                fetch_factory=make_session_and_fetch, item_col="url",
                out_col="payload", attempts=7, delay=15, backoff=2,
                timeout=300, on_exhausted="null",
            ),
            concurrency=8, batch_size=64, batch_format="pyarrow",
        )

    ``fetch_factory`` runs ONCE per actor (build the session / client /
    codec there) and returns the item→value callable. ``on_exhausted``:
    ``"raise"`` fails the task (Ray then applies its own task retry
    policy), ``"null"`` writes a null and records the error string in
    ``<out_col>_error``, ``"drop"`` removes the row — resumable pipelines
    usually want ``"null"`` so one dead URL at hour 40 of a 100 TB run
    doesn't kill the job.
    """

    def __init__(
        self,
        fetch_factory: Callable[[], Callable[[Any], Any]],
        item_col: str,
        out_col: str = "payload",
        attempts: int = 7,
        delay: float = 15.0,
        backoff: float = 2.0,
        timeout: float | None = None,
        on_exhausted: str = "raise",
        out_type: pa.DataType | None = None,
        sleep: Callable[[float], None] = time.sleep,
    ):
        assert on_exhausted in ("raise", "null", "drop")
        self.fetch = fetch_factory()
        self.item_col = item_col
        self.out_col = out_col
        self.attempts = attempts
        self.delay = delay
        self.backoff = backoff
        self.timeout = timeout
        self.on_exhausted = on_exhausted
        self.out_type = out_type
        self.sleep = sleep
        # Shared across items so sessions/connections in fetch threads are
        # reused. Wide enough that a hung (timed-out but still running)
        # call doesn't serialize later attempts; a fetch that hangs forever
        # can still eventually exhaust the pool — that's inherent to
        # uninterruptible Python threads, and why `timeout` should be set
        # above the true worst-case service time, as the reference's 300 s
        # is.
        self.executor = (
            concurrent.futures.ThreadPoolExecutor(max_workers=max(8, attempts))
            if timeout is not None else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        items: Iterable[Any] = batch[self.item_col].to_pylist()
        values: list[Any] = []
        errors: list[str | None] = []
        keep = []
        for item in items:
            try:
                values.append(retry_call(
                    self.fetch, (item,), attempts=self.attempts,
                    delay=self.delay, backoff=self.backoff,
                    timeout=self.timeout, sleep=self.sleep,
                    executor=self.executor,
                ))
                errors.append(None)
                keep.append(True)
            except RetryExhaustedError as exc:
                if self.on_exhausted == "raise":
                    raise
                values.append(None)
                errors.append(str(exc.last))
                keep.append(self.on_exhausted == "null")
        out = batch.append_column(self.out_col, pa.array(values, type=self.out_type))
        if self.on_exhausted == "null":
            out = out.append_column(f"{self.out_col}_error", pa.array(errors, pa.string()))
        if self.on_exhausted == "drop":
            out = out.filter(pa.array(keep))
        return out
