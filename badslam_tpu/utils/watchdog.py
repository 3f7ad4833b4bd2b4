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

import functools
import os
import time

from badslam_tpu.utils import logging as log


class DegradedSessionError(RuntimeError):
    """Raised by the frontend when the dispatch watchdog trips AND the
    canary probe confirms the session is in the per-kernel sync fallback.
    Carries the index of the last fully-processed frame so the recovery
    path (save state -> exec a fresh process with --load_state) can resume
    exactly where the degraded process stopped."""

    def __init__(self, last_frame_index: int):
        super().__init__(
            f"device session degraded (confirmed by canary) after frame "
            f"{last_frame_index}; restart the process to recover")
        self.last_frame_index = last_frame_index


# ---------------------------------------------------------------------------
# Canary probe: a known-cost program that discriminates a DEGRADED session
# (per-kernel synchronous fallback) from transient host/relay contention.
# A watchdog trip alone is ambiguous — on the 1-core box the loop-detection
# worker stealing CPU from the dispatch path inflates per-call host clocks
# exactly like real degradation (observed in the round-3 long-run bench).
# ---------------------------------------------------------------------------

_CANARY_ITERS = 64


@functools.lru_cache(maxsize=1)
def _canary_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def canary(x):
        # A fori_loop body is one XLA fusion per iteration: healthy
        # sessions execute the whole loop in one async program (<10 ms
        # even through a busy relay); the degraded per-kernel sync path
        # pays a relay round trip per iteration (~2-7 ms each, measured
        # in PERF_NOTES.md) -> >100 ms total. The cost model is therefore
        # a step function, robust to ordinary queue noise.
        def body(i, v):
            return jnp.sin(v) * 1.0001 + 1e-6 * i

        return jax.lax.fori_loop(0, _CANARY_ITERS, body, x)

    return canary


def probe_degradation(threshold_s: float = 0.08, reps: int = 3) -> bool:
    """True iff the canary program's median runtime exceeds `threshold_s`
    — i.e. the session is genuinely in the per-kernel sync fallback.
    Compile (first call) is excluded; no device values are read."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    fn = _canary_fn()
    x = jnp.zeros((1024,), jnp.float32)
    jax.block_until_ready(fn(x))  # compile / warm (not timed)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    log.info("degradation canary: median %.1f ms over %d runs "
             "(threshold %.0f ms)", 1e3 * med, reps, 1e3 * threshold_s)
    return med > threshold_s


def fake_degrade_at() -> int:
    """Test-only injection point: BADSLAM_FAKE_DEGRADE_AT=<frame> makes the
    frontend treat that frame as a confirmed degradation (the recovery
    path is then exercised without a real poisoned session). -1 = off."""
    try:
        return int(os.environ.get("BADSLAM_FAKE_DEGRADE_AT", "-1"))
    except ValueError:
        return -1


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
        self._quiet_until = 0.0

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
            if time.perf_counter() < self._quiet_until:
                return True  # re-trip inside a ruled-out contention window
            log.warning(
                "%s: dispatch time jumped %.0fx (%.1f ms vs %.2f ms "
                "baseline) for %d consecutive calls — the device session "
                "looks DEGRADED (on the axon relay this is the per-kernel "
                "sync fallback after a device->host value read; see "
                "PERF_NOTES.md). Running the canary probe to confirm.",
                self.name, seconds / max(self.baseline, 1e-9),
                1e3 * seconds, 1e3 * (self.baseline or 0.0), self._slow_run)
            return True
        return False

    def reset_trip(self, quiet_s: float = 0.0) -> None:
        """Re-arm after a canary probe ruled the trip a false positive
        (transient host/queue contention): a later REAL degradation must
        still be detected. `quiet_s` suppresses the warning log (not the
        detection) for that many seconds — sustained 1-core contention
        otherwise re-trips every `patience` frames and floods the log
        (observed 4 warnings/s in the round-4 bench)."""
        self.tripped = False
        self._slow_run = 0
        if quiet_s > 0.0:
            self._quiet_until = time.perf_counter() + quiet_s
