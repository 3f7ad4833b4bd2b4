"""Chronometric device-scalar readout: extract a device scalar WITHOUT any
device->host transfer by encoding it in program EXECUTION TIME.

Why this exists (PERF_NOTES round 5): on the current axon relay the FIRST
D2H read issued after a SLAM run either crashes the TPU worker outright
(~95-130 s into the session flush; observed after chunked runs) or hangs
beyond any budget tried (>900 s after unchunked runs) — which has eaten
the long-run ATE / loop-closure evidence three rounds in a row. But
program SUBMISSION + `jax.block_until_ready` stay healthy after the very
same runs (the bench liveness probe completes in 0.02-0.06 s). So the one
channel still open is time: run a program whose duration is proportional
to one decimal digit of the value, and read the digit off the host clock.
This is the read-free discipline (CLAUDE.md) taken to its conclusion —
even the final metrics leave the device without a transfer.

Protocol for v = round(|x| * scale), D decimal digits:
  probe(x, i, force, reps, W, a): runs d*reps fixed-cost matmul steps in
    one `lax.while_loop`, where d = digit i of v (i = -1 means v mod 9;
    force >= 0 overrides d — used for calibration). ONE compile serves
    every call: i/force/reps are traced.
  calibrate: time force=0 and force=9 probes -> (offset, unit); grow reps
    (traced, no recompile) until unit >= the target, so relay submission
    jitter (~2.5-3 ms under load) is small against half a unit.
  extract: time each digit; u = (t - offset)/unit; d = round(u); any
    digit with |u - d| > ambiguity is re-measured (median of 3 times).
  verify: one extra probe measures v mod 9; 10^k == 1 (mod 9), so the
    digit sum must match mod 9 — an end-to-end checksum on the decode.
    On mismatch the whole extraction re-runs once with a doubled unit.

COMPILE COST MUST BE PAID BEFORE THE RUN. The first round-5 TPU attempt
ran the whole protocol cold AFTER the long run and expired its 1243 s
deadline: the probe compiles (one per input dtype) and the on-device ATE
program compile each cost minutes through the relay post-run, and
calibration then ran against that noise. `chrono_warmup()` exists for
exactly this: call it BEFORE the timed run (healthy relay, persistent
compile cache) — it compiles the probe for both scalar dtypes and stores
a calibration that `chronometric_read` reuses, so the post-run readout is
pure warm execution: ~(D+4) probes of <=9 units each, a few seconds.

Worst case cost ~ (D + calibration) probes * 9 units + submissions: a few
seconds — orders below any D2H budget ever observed, and it leaves the
worker alive (no flush is ever triggered).

Replaces the reference's trivial metric readbacks (cudaMemcpy of final
trajectory/stats, e.g. bad_slam.cc pose downloads) whose relay equivalent
is precisely the operation that crashes.
"""

from __future__ import annotations

import threading
import time
from typing import Optional

import numpy as np

_PROBE = None
_PROBE_STATE = None  # (W, a) device operands, created once per process
_CALIB = None  # stored by chrono_warmup(); reused by chronometric_read()

# Growth cap for calibration reps: 9 * 2e7 while_loop steps is already
# ~minutes of device time — past this, timing is pure submission noise and
# the channel is unusable; raise instead of burning the caller's deadline.
_MAX_REPS = int(2e7)
# A single calibration probe exceeding this wall time means the growth
# loop has gone pathological (measured r05: the cold post-run attempt grew
# reps against compile/relay noise until probes cost minutes each).
_MAX_PROBE_S = 45.0


class ChronoError(RuntimeError):
    pass


def _get_probe(size: int):
    """Build (once) the jitted probe and its device operands.

    The weight matrix and seed activations are ARGUMENTS to the jit (never
    closure-captured: lowering would read captured device arrays back to
    the host — the exact degradation this module exists to avoid)."""
    global _PROBE, _PROBE_STATE
    import jax
    import jax.numpy as jnp

    if _PROBE is None:
        @jax.jit
        def _probe(x, scale, i, ndig, force, reps, W, a):
            v = jnp.round(jnp.abs(x).astype(jnp.float32)
                          * scale.astype(jnp.float32)).astype(jnp.int32)
            v = jnp.clip(v, 0, jnp.power(jnp.int32(10), ndig) - 1)
            p = jnp.power(jnp.int32(10),
                          jnp.maximum(ndig - 1 - i, 0).astype(jnp.int32))
            d = jnp.where(i >= 0, (v // p) % 10, v % 9)
            d = jnp.where(force >= 0, force, d).astype(jnp.int32)
            n = d * reps

            def _cond(c):
                return c[0] < n

            def _body(c):
                k, a = c
                a = jnp.tanh(jnp.matmul(
                    a, W, precision=jax.lax.Precision.HIGHEST))
                return k + 1, a

            _, a = jax.lax.while_loop(_cond, _body, (jnp.int32(0), a))
            return a.sum()

        _PROBE = _probe
    if _PROBE_STATE is None or _PROBE_STATE[0].shape[0] != size:
        rng = np.random.default_rng(7)
        W = jnp.asarray(
            (0.9 / np.sqrt(size))
            * rng.standard_normal((size, size)).astype(np.float32))
        a = jnp.asarray(rng.standard_normal((8, size)).astype(np.float32))
        _PROBE_STATE = (W, a)
    return _PROBE, _PROBE_STATE


def _timed_call(fn, args, hang_timeout_s: float) -> float:
    """Submit + block_until_ready on a daemon thread with a bounded join:
    the block is un-interruptible in C land, so a truly wedged relay must
    not hang the caller (bench children finish via os._exit after this
    raises — jax's atexit teardown would join the same wedged state)."""
    import jax

    box = {}

    def _run():
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            box["t"] = time.perf_counter() - t0
        except Exception as e:  # pragma: no cover - relay faults
            box["e"] = e

    th = threading.Thread(target=_run, daemon=True)
    th.start()
    th.join(hang_timeout_s)
    if th.is_alive():
        raise ChronoError(f"probe hung > {hang_timeout_s:.0f}s")
    if "e" in box:
        raise ChronoError(f"probe failed: {box['e']!r}")
    return box["t"]


def _probe_timer(x, scale: float, digits: int, *, size: int,
                 hang_timeout_s: float, left, stats: dict, trace: list):
    """Bind a `(i, force, reps) -> seconds` timer for one target scalar.
    Every probe is appended to `trace` so a raised ChronoError can carry
    the evidence of WHERE the time went (the r05 post-mortem had none)."""
    import jax.numpy as jnp

    probe, (W, a) = _get_probe(size)
    x = jnp.asarray(x)
    scale_dev = jnp.float32(scale)
    ndig = jnp.int32(digits)

    def _t(i: int, force: int, reps: int) -> float:
        if left() <= 0:
            raise ChronoError(
                f"chronometric deadline expired; probe trace tail="
                f"{trace[-8:]}")
        stats["n_probes"] += 1
        rem = left()
        budget = hang_timeout_s if rem == float("inf") else \
            min(hang_timeout_s, max(30.0, rem))
        t = _timed_call(
            probe,
            (x, scale_dev, jnp.int32(i), ndig, jnp.int32(force),
             jnp.int32(reps), W, a),
            budget)
        trace.append((int(i), int(force), int(reps), round(t, 4)))
        return t

    return _t


def _calibrate(_t, unit_ms: float, start_reps: int = 1,
               max_iters: int = 14):
    """(offset, unit, reps) with unit >= unit_ms/1000. Bounded: raises
    (with the caller's trace in the ChronoError) instead of growing reps
    forever against submission noise."""
    reps = max(1, int(start_reps))
    unit = 0.0
    for _ in range(max_iters):
        t0s = sorted(_t(0, 0, reps) for _ in range(2))
        t9 = _t(0, 9, reps)
        if t9 > _MAX_PROBE_S:
            raise ChronoError(
                f"calibration probe cost pathological ({t9:.1f}s at "
                f"reps={reps}); channel unusable")
        offset = t0s[0]
        unit = (t9 - offset) / 9.0
        if unit >= unit_ms / 1000.0:
            # settle the offset with one more zero sample
            offset = float(np.median(t0s + [_t(0, 0, reps)]))
            return offset, unit, reps
        if reps >= 100_000 and t9 < 0.05:
            # A 900k-step serial matmul chain CANNOT complete in 50 ms:
            # the relay is acking `block_until_ready` at enqueue without
            # waiting for execution (async-ack build, measured 2026-08-20:
            # 1e6-step chains "block" in 0.1 ms, zero backpressure). No
            # execution-time channel exists on such a relay — bail in
            # milliseconds so callers fall to the D2H path immediately
            # instead of growing reps to the cap for minutes.
            raise ChronoError(
                f"relay acks blocks without executing (t9={t9 * 1e3:.2f}ms "
                f"at reps={reps}); timing channel unusable")
        if reps >= _MAX_REPS:
            raise ChronoError(
                f"probe unit not measurable at reps cap (unit="
                f"{unit * 1e3:.3f}ms, target {unit_ms}ms)")
        grow = 4.0 if unit <= 0 else max(2.0, 1.3 * (unit_ms / 1000.0) / unit)
        reps = int(min(reps * grow + 1, _MAX_REPS))
    raise ChronoError(
        f"calibration failed to converge (reps={reps}, "
        f"unit={unit * 1e3:.3f}ms, target {unit_ms}ms)")


def chrono_warmup(*, unit_ms: float = 25.0, size: int = 256,
                  hang_timeout_s: float = 600.0,
                  deadline_s: Optional[float] = None) -> dict:
    """Compile + calibrate the chrono channel BEFORE the timed run.

    Pays the probe compiles (one per scalar input dtype: the f32 metrics
    and the i32 counters) and the reps calibration while the relay is
    healthy; `chronometric_read` then reuses the stored calibration and
    only re-zeros the offset, making the post-run readout pure warm
    execution. With the persistent TPU compile cache enabled the compiles
    also carry across sessions. Issues NO device reads."""
    global _CALIB
    import jax.numpy as jnp

    t_start = time.perf_counter()
    stop_at = (t_start + deadline_s) if deadline_s is not None else None

    def _left() -> float:
        return float("inf") if stop_at is None \
            else stop_at - time.perf_counter()

    stats = {"n_probes": 0}
    trace: list = []
    compile_s = []
    timer_f32 = None
    for x in (jnp.float32(0.0), jnp.int32(0)):
        _t = _probe_timer(x, 1.0, 3, size=size,
                          hang_timeout_s=hang_timeout_s, left=_left,
                          stats=stats, trace=trace)
        compile_s.append(round(_t(0, 0, 1), 3))
        if timer_f32 is None:
            timer_f32 = _t
    offset, unit, reps = _calibrate(timer_f32, unit_ms)
    _CALIB = {"offset": offset, "unit": unit, "reps": reps, "size": size}
    return {
        "compile_s": compile_s,
        "offset_ms": round(offset * 1e3, 3),
        "unit_ms": round(unit * 1e3, 3),
        "reps": reps,
        "n_probes": stats["n_probes"],
        "elapsed_s": round(time.perf_counter() - t_start, 3),
    }


def chronometric_read(x, *, scale: float, digits: int,
                      unit_ms: float = 12.0,
                      ambiguity: float = 0.35,
                      deadline_s: Optional[float] = None,
                      hang_timeout_s: float = 180.0,
                      size: int = 256,
                      use_calibration: bool = True) -> dict:
    """Read |device scalar x| as round(|x|*scale) with `digits` decimal
    digits, via the timing channel only. Returns a dict with:
      value        decoded float (raw / scale)
      raw          decoded int
      digits       the decoded digit list (most significant first)
      checksum_ok  mod-9 digit-sum checksum verdict
      unit_ms      calibrated per-step cost actually used
      calibration  "warmup" (reused from chrono_warmup) or "fresh"
      n_probes     total timed submissions
      elapsed_s    wall time spent
    Raises ChronoError on a hung/faulted probe or an expired deadline."""
    t_start = time.perf_counter()
    stop_at = (t_start + deadline_s) if deadline_s is not None else None

    def _left() -> float:
        return float("inf") if stop_at is None \
            else stop_at - time.perf_counter()

    stats = {"n_probes": 0}
    trace: list = []
    _t = _probe_timer(x, scale, digits, size=size,
                      hang_timeout_s=hang_timeout_s, left=_left,
                      stats=stats, trace=trace)

    # -- compile + warm (no-op when chrono_warmup already compiled) --
    compile_s = _t(0, 0, 1)

    calib = _CALIB if (use_calibration and _CALIB is not None
                       and _CALIB["size"] == size
                       and _CALIB["unit"] >= unit_ms / 1000.0) else None
    if calib is not None:
        unit, reps = calib["unit"], calib["reps"]
        # Re-zero the offset only: the constant term (submission + fixed
        # program cost) shifts with relay load between warmup and now;
        # the slope (per-step cost) does not — same program, same shapes.
        offset = float(np.median([_t(0, 0, reps) for _ in range(3)]))
        calibration = "warmup"
    else:
        offset, unit, reps = _calibrate(_t, unit_ms)
        calibration = "fresh"

    def _extract():
        out = []
        times = []
        for i in list(range(digits)) + [-1]:
            ts = [_t(i, -1, reps)]
            u = (ts[0] - offset) / unit
            d = int(round(u))
            hi = 8 if i < 0 else 9
            if abs(u - d) > ambiguity or d < 0 or d > hi:
                ts += [_t(i, -1, reps) for _ in range(2)]
                u = (float(np.median(ts)) - offset) / unit
                d = int(round(u))
            out.append(min(max(d, 0), hi))
            times.append(round(min(ts), 4))
        ds, csum = out[:digits], out[-1]
        ok = (sum(ds) % 9) == csum
        return ds, csum, ok, times

    ds, csum, ok, times = _extract()
    if not ok and _left() > 0:
        # one full retry at roughly double the unit (traced reps: no
        # recompile) with a freshly measured offset
        offset, unit, reps = _calibrate(
            _t, 2.0 * max(unit_ms, unit * 1e3), start_reps=reps * 2)
        calibration = "fresh"
        ds2, csum2, ok2, times2 = _extract()
        if ok2 or not ok:
            ds, csum, ok, times = ds2, csum2, ok2, times2

    raw = int("".join(str(d) for d in ds)) if ds else 0
    return {
        "value": raw / scale,
        "raw": raw,
        "digits": ds,
        "checksum": csum,
        "checksum_ok": bool(ok),
        "unit_ms": round(unit * 1000.0, 3),
        "reps": reps,
        "calibration": calibration,
        "compile_s": round(compile_s, 3),
        "probe_times_s": times,
        "n_probes": stats["n_probes"],
        "elapsed_s": round(time.perf_counter() - t_start, 3),
    }


def chronometric_read_int(x, *, max_value: int = 999, **kw) -> dict:
    """Convenience wrapper for small non-negative integer counters
    (e.g. the device loop-closure counter)."""
    digits = len(str(max_value))
    out = chronometric_read(x, scale=1.0, digits=digits, **kw)
    out["value"] = int(round(out["value"]))
    return out


def chrono_selftest(*, scale: float = 1e7, digits: int = 8,
                    value: float = 2.718e-4, **kw) -> dict:
    """End-to-end decode check on a KNOWN host constant, run through the
    identical path as the metric reads (same scale/digits as the bench
    ATE read). A wrong decode here means the channel — not the metric —
    is lying; the bench flags the metrics accordingly."""
    import jax.numpy as jnp

    want = int(round(value * scale))
    out = chronometric_read(jnp.float32(value), scale=scale, digits=digits,
                            **kw)
    out["want"] = want
    out["ok"] = bool(out["raw"] == want and out["checksum_ok"])
    return out
