#!/usr/bin/env python
"""Bisect the post-run D2H wedge to its minimal trigger (PERF_NOTES.md).

Observed: after a QVGA long-run bench child, programs still submit and
complete at full speed (liveness probe 0.01 s) but ANY device->host value
read hangs >60 s, un-interruptibly, in C land. The headline VGA section
in the parent process reads fine. This probe runs ONE candidate trigger
in a fresh process, then attempts a sentinel read on a daemon thread with
a timeout, and prints a single JSON verdict line.

Usage:  python tools/probe_wedge.py <stage>
Stages:
  control    upload sentinel, read it back (no other device work)
  canary     run the watchdog degradation canary (fori_loop program) first
  scan       run a small lax.scan program first (steady-chunk shape analog)
  donate     run a donated-buffer update chain first (frame-update analog)
  while      run a while_loop program first (fused-BA shape analog)
  upload120  120 single-frame-sized QVGA uploads first (chunk upload analog)

Each stage is additive to `control` only (one trigger per process — the
wedge is per-process state).
"""

from __future__ import annotations

import json
import sys
import threading
import time

import numpy as np

sys.path[:0] = ["/root/repo"]


def timed_read(x, timeout_s: float = 60.0):
    """(value, seconds) or raises TimeoutError; daemon thread because the
    hang is un-interruptible in C land (SIGALRM never fires)."""
    import jax

    box = {}

    def _do():
        try:
            jax.block_until_ready(x)
            box["v"] = np.asarray(x)
        except Exception as e:  # pragma: no cover
            box["e"] = e

    t0 = time.perf_counter()
    th = threading.Thread(target=_do, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        raise TimeoutError(f"read hung > {timeout_s:.0f}s")
    if "e" in box:
        raise box["e"]
    return box["v"], time.perf_counter() - t0


def main() -> None:
    stage = sys.argv[1] if len(sys.argv) > 1 else "control"
    import jax
    import jax.numpy as jnp

    from badslam_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    out = {"stage": stage, "backend": jax.default_backend()}

    sentinel = jnp.asarray(np.float32(42.0))
    jax.block_until_ready(sentinel)

    t0 = time.perf_counter()
    if stage == "canary":
        from badslam_tpu.utils.watchdog import probe_degradation

        out["canary_degraded"] = probe_degradation()
    elif stage == "scan":
        @jax.jit
        def scanned(x):
            def body(c, _):
                return jnp.tanh(c) + 0.1, jnp.sum(c)
            c, ys = jax.lax.scan(body, x, None, length=9)
            return c, ys

        x = jnp.zeros((240, 320), jnp.float32)
        jax.block_until_ready(scanned(x))
    elif stage == "while":
        @jax.jit
        def looped(x):
            def cond(s):
                i, v = s
                return (i < 10) & jnp.any(v < 1e9)

            def body(s):
                i, v = s
                return i + 1, jnp.tanh(v @ v) + 1.0

            return jax.lax.while_loop(cond, body, (jnp.int32(0), x))

        x = jnp.zeros((256, 256), jnp.float32)
        jax.block_until_ready(looped(x))
    elif stage == "donate":
        @jax.jit
        def upd(buf, i):
            return buf.at[i].set(1.0)

        upd_d = jax.jit(upd, donate_argnums=(0,))
        buf = jnp.zeros((1024,), jnp.float32)
        for i in range(120):
            buf = upd_d(buf, jnp.int32(i % 1024))
        jax.block_until_ready(buf)
    elif stage == "upload120":
        acc = jnp.zeros((), jnp.float32)
        add = jax.jit(lambda a, d, r: a + jnp.sum(d.astype(jnp.float32))
                      + jnp.sum(r.astype(jnp.float32)))
        rng = np.random.default_rng(0)
        for _ in range(120):
            d = jnp.asarray(rng.integers(0, 1000, (240, 320)).astype(np.uint16))
            r = jnp.asarray(rng.integers(0, 255, (240, 320, 3)).astype(np.uint8))
            acc = add(acc, d, r)
        jax.block_until_ready(acc)
    elif stage != "control":
        print(json.dumps({"error": f"unknown stage {stage}"}))
        return
    out["trigger_s"] = round(time.perf_counter() - t0, 3)

    try:
        v, dt = timed_read(sentinel)
        out["sentinel_read"] = float(v)
        out["read_s"] = round(dt, 3)
        out["wedged"] = False
    except Exception as e:
        out["read_error"] = repr(e)[:120]
        out["wedged"] = True
    print(json.dumps(out), flush=True)
    if out["wedged"]:
        sys.stdout.flush()
        import os

        os._exit(0)  # jax atexit would join the wedged transfer


if __name__ == "__main__":
    main()
