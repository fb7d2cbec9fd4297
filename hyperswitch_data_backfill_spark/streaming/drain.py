"""Shared stall-based drain for live-StreamingQuery fixtures.

Every live wire-source fixture key (the pgwire keyset tail, the kafka
wire tumbling aggs, the pgwire CDC stream) needs the same wait shape:
block until a monotone progress signal reaches a finite target, fail
fast on a query exception, and time out on STALL — the signal stopped
advancing — rather than on a flat total, because under full-suite host
load a healthy stream drains slowly but steadily and a flat deadline
trips while rows are still arriving (r14 verdict item 5). Factored here
before a third fixture copied the constants (r15 verdict item 8).
"""

from __future__ import annotations

import time
from typing import Callable

_STALL_S = 180.0  # no-progress window before giving up
_HARD_S = 1200.0  # absolute cap — a liveness bound, not a pace bet


def drain_stream(
    q,
    progress: Callable[[], object],
    target,
    label: str,
    *,
    stall_s: float = _STALL_S,
    hard_s: float = _HARD_S,
    poll_s: float = 0.2,
) -> None:
    """Wait until ``progress() >= target`` on live StreamingQuery ``q``.

    ``progress()`` returns the current value of any monotone signal
    comparable to ``target`` (sink row count, committed watermark, …)
    or None while the signal does not exist yet. Raises the query's own
    exception if it dies, else TimeoutError when the signal has not
    ADVANCED for ``stall_s`` seconds or after ``hard_s`` total — with
    ``q.lastProgress`` attached so a driver-sweep failure is
    diagnosable from the message alone.
    """
    t0 = time.time()
    last_val: object = None
    last_adv = t0
    while True:
        val = progress()
        if val is not None and val >= target:
            return
        exc = q.exception()
        if exc is not None:
            raise exc
        now = time.time()
        if val != last_val:
            last_val, last_adv = val, now
        if now - last_adv > stall_s or now - t0 > hard_s:
            raise TimeoutError(
                f"{label}: never drained ({val!r}/{target!r}; "
                f"{now - last_adv:.0f}s since last progress, "
                f"{now - t0:.0f}s total); lastProgress={q.lastProgress}")
        time.sleep(poll_s)
