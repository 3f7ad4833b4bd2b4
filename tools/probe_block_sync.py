"""Does `jax.block_until_ready` actually wait for execution on the axon
relay? (round-5 chronometric post-mortem)

Evidence that it may NOT: chronometric calibration probes whose
while_loop runs 5e7 serial 8x256x256 matmul steps returned in ~58 ms on
the TPU (2026-08-19, /tmp/chrono_tpu2.out) — physically impossible if the
block waits for execution; the same probes behave correctly on CPU. The
implied model is async-ack: the relay acknowledges the buffer as "ready"
at enqueue (or at some shallow pipeline point), and real execution cost
surfaces later as BACKPRESSURE on a subsequent submission.

This probe times, WITHOUT any device value read:
  1. a static lax.scan chain of L dependent tiny matmuls for
     L in {100, 10_000, 100_000} — block_until_ready after each. If the
     times do not scale ~linearly with L, the block is not a sync.
  2. the same chain via lax.while_loop with a TRACED trip count (the
     chronometric probe's exact shape) — distinguishes "while_loop is
     special" from "all blocks are async".
  3. backpressure probing: submit ONE big program, then N trivial
     programs, blocking each; report where the wall time lands. If the
     big program's cost appears on a later trivial submission, that
     queue-position lag is a usable (if noisier) timing channel.

Run: python tools/probe_block_sync.py          (real TPU)
     JAX_PLATFORMS=cpu python tools/probe_block_sync.py   (sanity)
Prints one JSON line per experiment; PERF_NOTES.md records the findings.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]


def main() -> None:
    import jax

    # sitecustomize force-registers the axon plugin; env alone won't stick
    plat = os.environ.get("BADSLAM_PLATFORM") or os.environ.get(
        "JAX_PLATFORMS")
    if plat and plat != "axon":
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    from badslam_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    size = 256
    rng = np.random.default_rng(7)
    W = jnp.asarray((0.9 / np.sqrt(size))
                    * rng.standard_normal((size, size)).astype(np.float32))
    a0 = jnp.asarray(rng.standard_normal((8, size)).astype(np.float32))

    def _chain_scan(length):
        @jax.jit
        def f(a, W):
            def body(a, _):
                return jnp.tanh(jnp.matmul(
                    a, W, precision=jax.lax.Precision.HIGHEST)), None
            a, _ = jax.lax.scan(body, a, None, length=length)
            return a.sum()
        return f

    @jax.jit
    def chain_while(a, W, n):
        def cond(c):
            return c[0] < n

        def body(c):
            k, a = c
            return k + 1, jnp.tanh(jnp.matmul(
                a, W, precision=jax.lax.Precision.HIGHEST))

        _, a = jax.lax.while_loop(cond, body, (jnp.int32(0), a))
        return a.sum()

    @jax.jit
    def trivial(x):
        return x + 1.0

    # -- 1. static scan scaling ------------------------------------------
    for L in (100, 10_000, 100_000):
        f = _chain_scan(L)
        out = f(a0, W)             # compile + first run
        jax.block_until_ready(out)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(a0, W)
            jax.block_until_ready(out)
            times.append(round(time.perf_counter() - t0, 5))
        print(json.dumps({"exp": "scan_block", "length": L,
                          "times_s": times}), flush=True)

    # -- 2. while_loop with traced trip count ----------------------------
    out = chain_while(a0, W, jnp.int32(1))
    jax.block_until_ready(out)
    for n in (100, 10_000, 100_000, 1_000_000):
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = chain_while(a0, W, jnp.int32(n))
            jax.block_until_ready(out)
            times.append(round(time.perf_counter() - t0, 5))
        print(json.dumps({"exp": "while_block", "n": n,
                          "times_s": times}), flush=True)

    # -- 3. backpressure probing -----------------------------------------
    # One big while program (~n_big steps), then 40 trivial programs each
    # block_until_ready'd: where does the big cost surface?
    x = jnp.float32(3.0)
    jax.block_until_ready(trivial(x))
    for n_big in (100_000, 1_000_000):
        t0 = time.perf_counter()
        big = chain_while(a0, W, jnp.int32(n_big))
        jax.block_until_ready(big)
        t_big = time.perf_counter() - t0
        lags = []
        for _ in range(40):
            t0 = time.perf_counter()
            y = trivial(x)
            jax.block_until_ready(y)
            lags.append(round(time.perf_counter() - t0, 5))
        print(json.dumps({"exp": "backpressure", "n_big": n_big,
                          "t_big_s": round(t_big, 5),
                          "trivial_lags_s": lags}), flush=True)


if __name__ == "__main__":
    main()
