"""Dispatch-latency watchdog: detect a degraded device session from host
clocks alone.

Failure-detection subsystem (SURVEY.md §5.3 analog; the reference detects
pose-estimation divergence and GPU memory pressure — this adds the failure
mode specific to THIS runtime). On the axon TPU relay, a single
device→host value read silently drops the session from async command-queue
execution to a per-kernel synchronous path, making every subsequent
program ~1000× slower for the life of the process (PERF_NOTES.md). The
steady-state loop is deliberately read-free, so when degradation happens
anyway (a stray read in user code, a relay fault), the only symptom is
that every *dispatch* suddenly takes milliseconds instead of microseconds.

`DispatchWatch` learns the fast baseline (the rolling minimum of the first
samples) and warns ONCE when a sustained run of samples exceeds
`ratio × baseline` — host clocks only, no device reads, no false trip on a
single slow sample (GC pause, relay queue spike) or on cold-compile calls
(callers feed it post-warmup samples).
"""

from __future__ import annotations

from badslam_tpu.utils import logging as log


class DispatchWatch:
    """Feed per-call host-clock durations; warns once on sustained jumps.

    Args:
      name: label for the warning message.
      ratio: sustained slowdown factor vs the learned baseline that
        counts as degraded (default 50×; the real failure mode is ~1000×).
      warmup: number of samples used to learn the baseline minimum.
      patience: consecutive slow samples required before warning (absorbs
        one-off host hiccups).
      floor_s: ignore slowdowns that stay under this absolute duration —
        sub-millisecond jitter is never evidence of degradation.
    """

    def __init__(self, name: str, ratio: float = 50.0, warmup: int = 5,
                 patience: int = 3, floor_s: float = 0.05):
        self.name = name
        self.ratio = ratio
        self.warmup = warmup
        self.patience = patience
        self.floor_s = floor_s
        self.baseline: float | None = None
        self._seen = 0
        self._slow_run = 0
        self.tripped = False

    def sample(self, seconds: float) -> bool:
        """Record one duration; returns True iff this call tripped the
        (once-only) degradation warning."""
        self._seen += 1
        if self.baseline is None or seconds < self.baseline:
            self.baseline = seconds  # rolling minimum = the fast path
        if self.tripped or self._seen <= self.warmup:
            return False
        slow = (seconds > self.floor_s
                and seconds > self.ratio * (self.baseline or 0.0))
        self._slow_run = self._slow_run + 1 if slow else 0
        if self._slow_run >= self.patience:
            self.tripped = True
            log.warning(
                "%s: dispatch time jumped %.0fx (%.1f ms vs %.2f ms "
                "baseline) for %d consecutive calls — the device session "
                "looks DEGRADED (on the axon relay this is the per-kernel "
                "sync fallback after a device->host value read; see "
                "PERF_NOTES.md). Restart the process to recover.",
                self.name, seconds / max(self.baseline, 1e-9),
                1e3 * seconds, 1e3 * (self.baseline or 0.0), self._slow_run)
            return True
        return False
