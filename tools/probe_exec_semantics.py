"""Pin down the axon relay's execution semantics (round 5).

probe_block_sync.py proved `block_until_ready` never waits for execution
(1M-step serial chain "blocks" in 70 us); probe_backpressure.py proved
the program queue absorbs ~10 s of device work with zero pushback. So
WHEN does queued work actually execute, and what does a read change?
The only honest observable is a D2H read (it must materialize its
value). Two modes, run as separate processes:

  mode=noread   1. submit chain(1e6), block (acks instantly).
                2. sleep 10 s.
                3. READ the result, timed: fast => the device executed
                   it in the background; ~exec-time => fully lazy until
                   read.
                4. post-read: time chain(1e4/1e5/1e6) with block — the
                   round-4 lore says a post-program read arms per-kernel
                   sync (canary 0.02->30 ms), in which case block now
                   WAITS and these are the first TRUE execution times
                   ever measured on this relay.
                5. read each result (should be instant if block waited).

  mode=t0read   1. read a tiny sentinel at t=0 (pre-program).
                2-5. same as noread — does the t0 read change whether
                   block waits / execution is eager?

Every read is bounded on a daemon thread; on a hang the process prints
what it has and os._exit(0)s (jax atexit would join the wedge).

Run (TPU): python tools/probe_exec_semantics.py noread
           python tools/probe_exec_semantics.py t0read
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]


def _read(x, timeout_s: float):
    """Bounded D2H; returns (value|None, seconds|'hung')."""
    import jax

    box = {}

    def _do():
        try:
            t0 = time.perf_counter()
            v = np.asarray(x)
            box["t"] = time.perf_counter() - t0
            box["v"] = float(v.reshape(-1)[0])
        except Exception as e:  # pragma: no cover
            box["e"] = repr(e)[:120]

    th = threading.Thread(target=_do, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        return None, "hung"
    if "e" in box:
        return None, box["e"]
    return box["v"], round(box["t"], 4)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "noread"
    out = {"mode": mode}
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
    def chain(a, W, n):
        def cond(c):
            return c[0] < n

        def body(c):
            k, a = c
            return k + 1, jnp.tanh(jnp.matmul(
                a, W, precision=jax.lax.Precision.HIGHEST))

        _, a = jax.lax.while_loop(cond, body, (jnp.int32(0), a))
        return a.sum()

    if mode == "t0read":
        s = jnp.asarray(np.float32(42.0))
        v, t = _read(s, 240.0)
        out["t0_read_s"] = t
        if v is None:
            print(json.dumps(out), flush=True)
            os._exit(0)

    # compile chain (first call traces + compiles)
    t0 = time.perf_counter()
    y = chain(a0, W, jnp.int32(1))
    jax.block_until_ready(y)
    out["compile_block_s"] = round(time.perf_counter() - t0, 3)

    # 1-2. submit 1M-step chain, block, sleep.
    t0 = time.perf_counter()
    y = chain(a0, W, jnp.int32(1_000_000))
    jax.block_until_ready(y)
    out["submit_block_1e6_s"] = round(time.perf_counter() - t0, 5)
    time.sleep(10.0)

    # 3. read it.
    v, t = _read(y, 600.0)
    out["first_read_after_sleep"] = {"value_finite": bool(v is not None
                                                          and np.isfinite(v)),
                                     "seconds": t}
    print(json.dumps(out), flush=True)
    if v is None:
        os._exit(0)

    # 4. post-read timing: does block wait now?
    for n in (10_000, 100_000, 1_000_000):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            y = chain(a0, W, jnp.int32(n))
            jax.block_until_ready(y)
            ts.append(round(time.perf_counter() - t0, 5))
        v, rt = _read(y, 120.0)
        out[f"post_read_block_{n}"] = {"times_s": ts, "read_s": rt}
        print(json.dumps(out), flush=True)
        if v is None:
            os._exit(0)

    # 5. a second immediate read (lore: <1 ms after the first)
    s2 = jnp.asarray(np.float32(7.0))
    v, t = _read(s2, 120.0)
    out["second_tiny_read_s"] = t
    print(json.dumps(out), flush=True)
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
