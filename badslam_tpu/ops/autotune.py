"""Persisted kernel autotuning (CUDAAutoTuner analog).

The reference tunes every CUDA kernel's block size once per machine and
persists the results (libvis/src/libvis/cuda/cuda_auto_tuner.h:44-204,
applications/badslam/scripts/auto_tune_parameters.py). On TPU, XLA already
schedules fused programs, so the tunable decisions are coarser:

  * Pallas grid/block shapes (e.g. the bilateral filter's row-block height);
  * implementation selection — Pallas kernel vs the XLA-fused fallback —
    per image shape and backend.

`autotune(key, variants, iterations)` times each variant on the CURRENT
device with host clocks + block_until_ready (never reading device values)
and persists the winner in ~/.cache/badslam_tpu/auto_tuning_result.json,
the reference's auto_tuning_result.txt analog. `get`/`put` expose the
store to kernels that resolve tuned parameters at trace time."""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional

_TUNING_PATH = os.path.expanduser(
    "~/.cache/badslam_tpu/auto_tuning_result.json")


def _load() -> dict:
    try:
        with open(_TUNING_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _save(d: dict) -> None:
    os.makedirs(os.path.dirname(_TUNING_PATH), exist_ok=True)
    with open(_TUNING_PATH, "w") as f:
        json.dump(d, f, indent=2, sort_keys=True)


def get(key: str, default=None):
    return _load().get(key, default)


def put(key: str, value) -> None:
    d = _load()
    d[key] = value
    _save(d)


def backend_key(key: str) -> str:
    """Scope a tuning key by the active backend (decisions differ between
    the TPU and the CPU test backend)."""
    import jax

    return f"{jax.default_backend()}:{key}"


def autotune(
    key: str,
    variants: Dict[str, Callable[[], object]],
    iterations: int = 10,
    persist: bool = True,
) -> str:
    """Time each no-arg variant thunk (its return is blocked on), persist
    and return the fastest variant's name. Variants that raise are skipped.
    """
    import jax

    best_name: Optional[str] = None
    best_t = float("inf")
    for name, thunk in variants.items():
        try:
            jax.block_until_ready(thunk())  # compile + warm
            t0 = time.perf_counter()
            for _ in range(iterations):
                r = thunk()
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / iterations
        except Exception:
            continue
        if dt < best_t:
            best_name, best_t = name, dt
    if best_name is not None and persist:
        put(backend_key(key), best_name)
    return best_name
