"""Where does the axon relay apply backpressure? (round-5, after
probe_block_sync.py proved block_until_ready NEVER waits for execution:
a 1M-step serial chain "blocks" in 70 us on the TPU.)

If no observable ever reflects execution, every timing number is a
submission rate. But the 720-frame long-run DOES decay (upload stalls of
~90 ms/chunk by frame 700), so something throttles at depth. Candidates:
program-count queue limit, bytes-in-flight limit on H2D, or a relay-side
token bucket. Whichever it is becomes the substrate for (a) honest FPS
measurement (run long enough that pipe-fill is negligible) and (b) a
rebuilt chronometric channel (flood past the limit; steady-state
submission rate == execution rate).

Experiments (all read-free; bounded device work):
  flood_trivial    N tiny programs, per-submission lag -> count limit?
  flood_chain      N while-chains of n steps each (real serial work),
                   per-submission lag -> when does exec cost surface?
  flood_h2d        N 4 MB uploads, per-upload lag -> bytes limit?
  drain            after a flood, time one final trivial submission and
                   a 2 s sleep + another - does idle time drain the pipe?

Run: python tools/probe_backpressure.py [exp ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]


def _lags(fn) -> dict:
    """Run fn() N times; summarize per-call wall lags."""
    ts = []
    t_all = time.perf_counter()
    n = fn()
    wall = time.perf_counter() - t_all
    return n, wall


def main(argv=None) -> None:
    exps = (argv or sys.argv[1:]) or ["flood_trivial", "flood_chain",
                                      "flood_h2d", "drain"]
    import jax

    plat = os.environ.get("BADSLAM_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    from badslam_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    size = 256
    rng = np.random.default_rng(7)
    W = jnp.asarray((0.9 / np.sqrt(size))
                    * rng.standard_normal((size, size)).astype(np.float32))
    a0 = jnp.asarray(rng.standard_normal((8, size)).astype(np.float32))

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

    x = jnp.float32(3.0)
    jax.block_until_ready(trivial(x))
    jax.block_until_ready(chain_while(a0, W, jnp.int32(1)))

    def summarize(lags):
        lags = np.asarray(lags)
        big = np.flatnonzero(lags > 1e-3)
        return {
            "n": len(lags),
            "total_s": round(float(lags.sum()), 4),
            "mean_us": round(float(lags.mean() * 1e6), 1),
            "p50_us": round(float(np.percentile(lags, 50) * 1e6), 1),
            "p99_us": round(float(np.percentile(lags, 99) * 1e6), 1),
            "max_ms": round(float(lags.max() * 1e3), 3),
            "n_over_1ms": int(len(big)),
            "first_over_1ms": int(big[0]) if len(big) else None,
            "tail_mean_ms": round(float(lags[len(lags) // 2:].mean() * 1e3),
                                  4),
        }

    if "flood_trivial" in exps:
        lags = []
        out = None
        for i in range(8192):
            t0 = time.perf_counter()
            out = trivial(x)
            jax.block_until_ready(out)
            lags.append(time.perf_counter() - t0)
        print(json.dumps({"exp": "flood_trivial",
                          **summarize(lags)}), flush=True)

    if "flood_chain" in exps:
        # Each program: n=20_000 serial matmul steps. If per-step is even
        # 0.3 us that is 6 ms/program of REAL device work; 512 programs =
        # ~3 s of device time submitted as fast as the relay accepts.
        for n_steps in (20_000,):
            lags = []
            for i in range(512):
                t0 = time.perf_counter()
                out = chain_while(a0, W, jnp.int32(n_steps))
                jax.block_until_ready(out)
                lags.append(time.perf_counter() - t0)
            print(json.dumps({"exp": "flood_chain", "n_steps": n_steps,
                              **summarize(lags)}), flush=True)
            # Steady-state submission rate vs expectation: if backpressure
            # is real, tail_mean ~ per-program exec; if not, ~ p50 of
            # flood_trivial.

    if "flood_h2d" in exps:
        host = np.random.default_rng(0).standard_normal(
            (1024, 1024)).astype(np.float32)  # 4 MB
        lags = []
        for i in range(256):
            t0 = time.perf_counter()
            d = jnp.asarray(host)
            jax.block_until_ready(d)
            lags.append(time.perf_counter() - t0)
        print(json.dumps({"exp": "flood_h2d", "mb_each": 4,
                          **summarize(lags)}), flush=True)

    if "drain" in exps:
        # Does idle wall time drain queued work? Submit 256 chain
        # programs, then alternate sleeps and trivial submissions.
        for i in range(256):
            out = chain_while(a0, W, jnp.int32(20_000))
        jax.block_until_ready(out)
        probes = []
        for sleep_s in (0.0, 2.0, 2.0, 5.0):
            time.sleep(sleep_s)
            t0 = time.perf_counter()
            y = trivial(x)
            jax.block_until_ready(y)
            probes.append({"after_sleep_s": sleep_s,
                           "lag_ms": round((time.perf_counter() - t0) * 1e3,
                                           3)})
        print(json.dumps({"exp": "drain", "probes": probes}), flush=True)


if __name__ == "__main__":
    main()
