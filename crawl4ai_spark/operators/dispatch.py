"""F13/F14 — dispatcher analogs (reference ``async_dispatcher.py``).

The reference dispatchers control *task admission*: how many concurrent
browser crawls run, shrinking under host memory pressure
(``MemoryAdaptiveDispatcher``, async_dispatcher.py:148-215) or holding a
fixed concurrency (``SemaphoreDispatcher``, :622-633).  On Spark, intra-
generation concurrency belongs to the scheduler (task slots, AQE) — what a
dispatcher can and should control is the **generation batch size**: how
many URLs the engine admits into one fetch+extract generation.  These
controllers reproduce the reference's state machines at that granularity:

``MemoryAdaptiveController``
    - usage ≥ ``memory_threshold_percent`` (90) → *pressure mode*: the
      admitted batch halves each pressed generation (floor ``min_batch``) —
      the analog of not filling session slots (:410-414);
    - usage ≥ ``critical_threshold_percent`` (95) → admit **0**: the
      generation is deferred and queued URLs simply stay queued — the
      batch-world analog of requeue-with-increased-priority (:288-315,
      where in-flight tasks are aborted back onto the queue; here nothing
      was admitted, so nothing needs re-queuing);
    - usage ≤ ``recovery_threshold_percent`` (85) → pressure exits and the
      batch doubles back toward full (:200-205);
    - pressure persisting longer than ``memory_wait_timeout`` (600 s) →
      ``MemoryError`` (:190-198).

``SemaphoreController``
    - a constant admitted batch (``semaphore_count`` URLs per generation)
      — the fixed-concurrency analog (F14).

``priority_score``
    - the fairness/aging rule ``_get_priority_score`` (:217-226) as a
      Column expression, so frontier scheduling can fold starvation aging
      into the same window rank it already computes — no driver loop over
      the queue (the reference drains and re-heaps the whole PriorityQueue
      every cycle, :470-520; at 10^10 URLs that must be a column, not a
      heap).

Memory readings come from an injectable ``memory_reader`` (defaults to
/proc/meminfo) so tests drive the state machine deterministically; the
clock is injectable for the timeout path.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def proc_meminfo_percent() -> float:
    """System memory usage % from /proc/meminfo (psutil-free stand-in for
    the reference's ``psutil.virtual_memory().percent``)."""
    info: dict[str, int] = {}
    with open("/proc/meminfo") as f:
        for line in f:
            k, _, rest = line.partition(":")
            info[k] = int(rest.split()[0])  # kB
    total = info["MemTotal"]
    avail = info.get("MemAvailable",
                     info.get("MemFree", 0) + info.get("Cached", 0))
    return 100.0 * (total - avail) / total if total else 0.0


class MemoryAdaptiveController:
    """Generation-batch admission mirroring ``MemoryAdaptiveDispatcher``."""

    def __init__(self, batch_size: int, *,
                 memory_threshold_percent: float = 90.0,
                 critical_threshold_percent: float = 95.0,
                 recovery_threshold_percent: float = 85.0,
                 memory_wait_timeout: float | None = 600.0,
                 min_batch: int = 64,
                 memory_reader: Callable[[], float] | None = None,
                 clock: Callable[[], float] | None = None):
        if not (recovery_threshold_percent
                <= memory_threshold_percent
                <= critical_threshold_percent):
            raise ValueError("thresholds must satisfy recovery <= memory <= critical")
        self.batch_size = batch_size
        self.memory_threshold_percent = memory_threshold_percent
        self.critical_threshold_percent = critical_threshold_percent
        self.recovery_threshold_percent = recovery_threshold_percent
        self.memory_wait_timeout = memory_wait_timeout
        # pressure must never ADMIT MORE than the configured batch: clamp
        # the floor to the ceiling (min_batch=64 with batch_size=10 would
        # otherwise grow the batch under pressure)
        self.min_batch = max(1, min(min_batch, batch_size))
        self._read = memory_reader or proc_meminfo_percent
        self._clock = clock or time.time
        self.memory_pressure_mode = False
        self.current_memory_percent = 0.0
        self._high_memory_start: float | None = None
        self._current = batch_size

    def admit(self) -> int:
        """Batch size for the next generation (0 = defer this generation)."""
        pct = self.current_memory_percent = float(self._read())
        now = self._clock()

        if pct >= self.memory_threshold_percent:
            if not self.memory_pressure_mode:
                self.memory_pressure_mode = True
            if self._high_memory_start is None:
                self._high_memory_start = now
            elif (self.memory_wait_timeout is not None
                  and self._high_memory_start is not None
                  and now - self._high_memory_start >= self.memory_wait_timeout):
                raise MemoryError(
                    f"Memory usage above {self.memory_threshold_percent}% for "
                    f"more than {self.memory_wait_timeout} seconds")
        else:
            # Reference semantics (async_dispatcher.py _memory_monitor_task):
            # the wait-timeout clock resets whenever usage drops below the
            # memory threshold — even in the 85-90% hysteresis band where
            # pressure mode (halved batch) persists.  Without this, usage
            # oscillating at e.g. 86-91% accumulates wall-clock toward
            # memory_wait_timeout and raises a spurious MemoryError.
            self._high_memory_start = None
            if self.memory_pressure_mode and pct <= self.recovery_threshold_percent:
                self.memory_pressure_mode = False

        if pct >= self.critical_threshold_percent:
            return 0
        if self.memory_pressure_mode:
            self._current = max(self.min_batch, self._current // 2)
        else:
            self._current = min(self.batch_size, self._current * 2)
        return self._current


class SemaphoreController:
    """Fixed-size admission — the ``SemaphoreDispatcher`` analog (F14)."""

    def __init__(self, semaphore_count: int):
        self.semaphore_count = semaphore_count

    def admit(self) -> int:
        return self.semaphore_count


def make_controller(kind: str, batch_size: int, opts: dict | None = None):
    opts = dict(opts or {})
    if kind == "memory_adaptive":
        return MemoryAdaptiveController(batch_size, **opts)
    if kind == "semaphore":
        return SemaphoreController(opts.get("semaphore_count", batch_size))
    raise ValueError(f"unknown dispatcher {kind!r} (memory_adaptive | semaphore)")


def priority_score(wait_gens: Column, retry_count: Column,
                   fairness_timeout_gens: int = 3) -> Column:
    """``_get_priority_score`` (async_dispatcher.py:217-226) as a Column:
    lower is higher priority; URLs waiting longer than the fairness window
    jump the queue with priority ``-wait``, otherwise priority equals the
    retry count.  Wait is measured in generations (the engine's clock):
    ``current_gen - enqueue_gen``."""
    return F.when(wait_gens > F.lit(fairness_timeout_gens),
                  -wait_gens.cast("double")) \
            .otherwise(retry_count.cast("double"))
