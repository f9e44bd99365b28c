"""Retry helper for transient TPU-relay failures.

The axon relay's remote compile can die mid-compile with a transport
error (`remote_compile: Network Error: Broken pipe`) during its slow
stretches — observed twice killing the production pipeline's first
`lvr extract-features` phase at the clamp-guard compile. The failure is
transient (the tunnel recovers in ~minutes, CLAUDE.md's wedge window);
a bounded retry with backoff turns a dead 30-minute pipeline run into a
slow phase. Only RELAY-TRANSPORT errors retry — numerics/compile errors
(and everything else) re-raise immediately.
"""

import time
from typing import Callable, TypeVar

T = TypeVar("T")

_TRANSIENT_MARKERS = ("remote_compile", "Broken pipe", "UNAVAILABLE",
                      "transport:", "DEADLINE_EXCEEDED")


def is_transient_relay_error(e: BaseException) -> bool:
    msg = str(e)
    return any(m in msg for m in _TRANSIENT_MARKERS)


def retry_transient(fn: Callable[[], T], *, retries: int = 3,
                    delays: tuple = (90.0, 180.0, 300.0),
                    label: str = "") -> T:
    """Call fn(); on a transient relay error, wait and retry (bounded)."""
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered below
            if attempt >= retries or not is_transient_relay_error(e):
                raise
            delay = delays[min(attempt, len(delays) - 1)]
            import sys
            print(f"[retry] transient relay error{' in ' + label if label else ''}"
                  f" (attempt {attempt + 1}/{retries}): {str(e)[:200]} — "
                  f"retrying in {delay:.0f}s", file=sys.stderr)
            time.sleep(delay)
    raise AssertionError("unreachable")
