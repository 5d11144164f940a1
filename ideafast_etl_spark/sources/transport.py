"""Transport reliability knobs (SURVEY.md §2.1/§2.2; reference dmp.py:126-136).

The reference's HTTP calls run with a ``(4 s connect, 302 s read)`` timeout
tuple and swallow failures into a success boolean that drives the
at-least-once retry loop. The actual HTTP client stays injected here (no
network in this environment, and real endpoints would be a leak surface),
but the *contract* — timeout budget, bounded retries with exponential
backoff, and raise-vs-absorb semantics — is real and testable:

- :class:`RetryPolicy` carries the timeout tuple for a real transport to
  apply per attempt, plus retry bounds.
- :func:`retrying` wraps any injected callable with that policy. Sources
  RAISE after exhaustion (a failed scan must fail the run); upload sinks
  ABSORB into ``False`` (dmp.py:120-160 — failures feed the retry loop,
  never crash the DAG), via ``absorb=...``.

Executor-safety: the wrapper and policy are plain picklable objects, so a
wrapped uploader ships into ``applyInPandas`` workers unchanged; the retry
loop runs executor-side next to the IO it guards.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass(frozen=True)
class RetryPolicy:
    """Timeout + retry contract for injected transports.

    ``connect_timeout``/``read_timeout`` mirror the reference's
    ``(4, 302)`` tuple (dmp.py:126-136); a real HTTP transport reads them
    via :attr:`timeouts` and applies them per attempt. ``max_attempts``
    bounds total tries; sleeps between attempts are
    ``backoff_base * 2**attempt`` seconds, capped at ``backoff_cap``.
    """

    connect_timeout: float = 4.0
    read_timeout: float = 302.0
    max_attempts: int = 3
    backoff_base: float = 0.5
    backoff_cap: float = 30.0
    retry_on: tuple[type[BaseException], ...] = field(
        default=(TimeoutError, ConnectionError, OSError)
    )

    @property
    def timeouts(self) -> tuple[float, float]:
        return (self.connect_timeout, self.read_timeout)

    def backoff(self, attempt: int) -> float:
        """Sleep before retry ``attempt`` (attempt 0 = first retry)."""
        return min(self.backoff_base * (2**attempt), self.backoff_cap)


def retrying(
    fn: Callable,
    policy: RetryPolicy,
    absorb=None,
    sleep: Callable[[float], None] = time.sleep,
) -> Callable:
    """Wrap ``fn`` with the policy's bounded-retry loop.

    Exceptions in ``policy.retry_on`` trigger backoff + retry up to
    ``max_attempts`` total tries. On exhaustion: re-raise (source
    semantics) unless ``absorb`` is a callable — then return
    ``absorb(last_exception)`` (sink semantics: e.g. ``lambda e: False``).
    Non-retryable exceptions always propagate immediately."""

    def wrapped(*args, **kwargs):
        last: BaseException | None = None
        for attempt in range(policy.max_attempts):
            try:
                return fn(*args, **kwargs)
            except policy.retry_on as e:
                last = e
                if attempt + 1 < policy.max_attempts:
                    sleep(policy.backoff(attempt))
        if absorb is not None:
            return absorb(last)
        assert last is not None
        raise last

    return wrapped
