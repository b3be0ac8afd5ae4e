"""Connector resilience: retry/backoff twins of the reference's live loops.

The reference hardens its connectors in two places:

- REST fetch: retry with a one-shot alternate-transport fallback (the
  IPv6 re-resolution path, ``eodhd_historical_service.py:112-146``).
- WebSocket stream: an outer reconnect loop with exponential backoff +
  jitter, a global duration gate, and backoff reset after a healthy
  connection (``eodhd_streaming_service.py:156-266``).

Both are transport-agnostic policies, so they live here as pure-Python
combinators over injectable callables — the engine stays testable offline
(every collaborator: transport, sleep, clock, rng is a parameter) and a
real deployment passes `requests.get` / a websocket frame iterator.
These run on the driver/connector side only; no Spark objects involved.
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass
from typing import Any, Callable, Iterable, Iterator


@dataclass(frozen=True)
class RetryPolicy:
    """Exponential backoff with jitter, shared by both loops.

    delay(n) = min(base * 2^n + uniform(0, jitter_frac * that), max_backoff)
    — the reference's schedule (eodhd_streaming_service.py:160-175).
    """

    retries: int = 3
    base_backoff: float = 1.0
    max_backoff: float = 30.0
    jitter_frac: float = 0.3

    def delay(self, attempt: int, rng: Callable[[float, float], float]) -> float:
        backoff = min(self.base_backoff * (2.0**attempt), self.max_backoff)
        return min(backoff + rng(0.0, self.jitter_frac * backoff), self.max_backoff)


def fetch_with_retry(
    fetch: Callable[..., Any],
    *args: Any,
    policy: RetryPolicy = RetryPolicy(),
    fallback: Callable[..., Any] | None = None,
    sleep: Callable[[float], None] = time.sleep,
    rng: Callable[[float, float], float] = random.uniform,
    retryable: tuple[type[BaseException], ...] = (Exception,),
) -> Any:
    """Call ``fetch(*args)`` with bounded retries; on the FIRST failure also
    try ``fallback(*args)`` once (the alternate-transport analog of the
    reference's IPv6 re-resolution) before entering the backoff schedule.

    Raises the last error once retries are exhausted — the caller decides
    whether a missing fetch is fatal (the reference logs-and-returns; an
    ingestion DAG wants the exception so the task is marked failed).
    """
    last: BaseException | None = None
    for attempt in range(policy.retries + 1):
        try:
            return fetch(*args)
        except retryable as e:
            last = e
            if attempt == 0 and fallback is not None:
                try:
                    return fallback(*args)
                except retryable as fe:
                    last = fe
            if attempt < policy.retries:
                sleep(policy.delay(attempt, rng))
    assert last is not None
    raise last


def resilient_frames(
    connect: Callable[[], Iterable[dict]],
    duration: float | None = None,
    policy: RetryPolicy = RetryPolicy(retries=1_000_000),
    sleep: Callable[[float], None] = time.sleep,
    clock: Callable[[], float] = time.monotonic,
    rng: Callable[[float, float], float] = random.uniform,
    retryable: tuple[type[BaseException], ...] = (ConnectionError, OSError),
) -> Iterator[dict]:
    """Yield frames from ``connect()``, reconnecting on connection errors
    with exponential backoff — the reference's outer ``while True`` stream
    loop (eodhd_streaming_service.py:206-266).

    Semantics mirrored exactly:
    - a clean iterator end reconnects too (the provider closed politely;
      the loop goes around, reference line 218-220) — immediately when
      the session produced frames, through the backoff schedule when it
      produced none (a dial-accept-close provider must not become a
      zero-delay reconnect storm, which the reference's bare `continue`
      would allow);
    - backoff RESETS after any successful frame — only consecutive
      failures escalate the delay;
    - the ``duration`` gate is global: checked before each reconnect and
      never slept past (reference ``time_left``);
    - non-retryable exceptions propagate (CancelledError analog).

    Delivery is at-least-once across reconnects — the store's idempotent
    dedup writer downstream is what makes the pipeline effectively-once.
    """
    started = clock()

    def time_left() -> float | None:
        return None if duration is None else max(0.0, duration - (clock() - started))

    consecutive_failures = 0
    while True:
        tl = time_left()
        if tl is not None and tl <= 0:
            return
        produced = False
        try:
            for frame in connect():
                produced = True
                consecutive_failures = 0
                yield frame
                tl = time_left()
                if tl is not None and tl <= 0:
                    return
        except retryable:
            produced = False  # a failed session never re-dials instantly
        if produced:
            continue  # healthy close: immediate re-dial (reference)
        tl = time_left()
        if tl is not None and tl <= 0:
            return
        delay = policy.delay(consecutive_failures, rng)
        if tl is not None:
            delay = min(delay, tl)
        sleep(delay)
        consecutive_failures += 1
