"""Chronometric readout + on-device ATE (the read-free evidence channel).

The timing-channel decode is validated on the CPU backend with a generous
per-digit unit so host-load jitter (this is a 1-core box) cannot flip a
digit; the device ATE is validated against the numpy Horn/Umeyama
reference (`synthetic.ate_rmse`), which itself matches the TUM/ETH3D
evaluation protocol."""

import numpy as np
import pytest

from badslam_tpu import synthetic as syn
from badslam_tpu.utils import timeread


def _random_rigid(rng):
    A = rng.standard_normal((3, 3))
    U, _, Vt = np.linalg.svd(A)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        U[:, -1] *= -1
        R = U @ Vt
    t = rng.standard_normal(3)
    return R, t


def test_ate_rmse_device_exact_alignment():
    # gt = R @ est + t exactly -> aligned ATE ~ 0, far below f32 noise of
    # the trajectory scale.
    rng = np.random.default_rng(3)
    est = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    R, t = _random_rigid(rng)
    gt = est @ R.T + t
    out = float(np.asarray(syn.ate_rmse_device(est, gt)))
    assert out < 1e-4


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ate_rmse_device_matches_host(seed):
    rng = np.random.default_rng(seed)
    est = rng.uniform(-0.8, 0.8, (151, 3)).astype(np.float32)
    R, t = _random_rigid(rng)
    gt = est @ R.T + t + 2e-4 * rng.standard_normal((151, 3))

    class _P:
        def __init__(self, t):
            self.t = t

    ref = syn.ate_rmse([_P(p) for p in est], [_P(p) for p in gt],
                       align="se3")
    dev = float(np.asarray(syn.ate_rmse_device(est, gt)))
    # ref ~ 2e-4; agree to ~1% (f32 moments + power iteration).
    assert dev == pytest.approx(ref, rel=2e-2, abs=5e-6)


def test_chronometric_read_known_values():
    import jax.numpy as jnp

    # ATE-shaped value: 123.4 um -> raw 123 at um resolution.
    for val, scale, digits, want in [
        (1.234e-4, 1e6, 7, 123),
        (0.0, 1e6, 7, 0),
        (7.0, 1.0, 3, 7),
    ]:
        got = None
        for attempt in range(2):  # timing test on a contended core: one
            out = timeread.chronometric_read(  # full re-read allowed
                jnp.float32(val), scale=scale, digits=digits,
                unit_ms=25.0, size=64, deadline_s=120.0)
            got = out["raw"]
            if got == want and out["checksum_ok"]:
                break
        assert got == want, out
        assert out["checksum_ok"], out


def test_chronometric_read_int_counter():
    import jax.numpy as jnp

    out = None
    for attempt in range(2):  # timing test on a contended core: one
        out = timeread.chronometric_read_int(  # full re-read allowed
            jnp.int32(42), max_value=999, unit_ms=25.0, size=64,
            deadline_s=120.0)
        if out["value"] == 42 and out["checksum_ok"]:
            break
    assert out["value"] == 42, out


def test_chronometric_deadline_raises():
    import jax.numpy as jnp

    with pytest.raises(timeread.ChronoError):
        timeread.chronometric_read(
            jnp.float32(1.0), scale=1.0, digits=3, unit_ms=25.0,
            size=64, deadline_s=-1.0)


def test_chrono_warmup_then_reuse():
    """chrono_warmup pre-pays compiles + calibration; a later read reuses
    the stored calibration (offset re-zeroed only) — the bench's
    warm-before-run discipline after the r05 post-run-compile expiry."""
    import jax.numpy as jnp

    old = timeread._CALIB
    try:
        info = timeread.chrono_warmup(unit_ms=25.0, size=64,
                                      deadline_s=240.0)
        assert info["unit_ms"] >= 25.0
        assert timeread._CALIB is not None
        out = None
        for _ in range(2):  # contended 1-core box: one re-read allowed
            out = timeread.chronometric_read(
                jnp.float32(1.234e-4), scale=1e6, digits=7,
                unit_ms=25.0, size=64, deadline_s=120.0)
            if out["raw"] == 123 and out["checksum_ok"]:
                break
        assert out["raw"] == 123, out
        # first attempt reuses the warmup calibration; the checksum-retry
        # fallback may legitimately re-calibrate ("fresh")
        assert out["calibration"] in ("warmup", "fresh")
    finally:
        timeread._CALIB = old


def test_chrono_selftest_known_constant():
    old = timeread._CALIB
    try:
        timeread._CALIB = None
        st = None
        for _ in range(2):
            st = timeread.chrono_selftest(size=64, unit_ms=25.0,
                                          deadline_s=240.0)
            if st["ok"]:
                break
        assert st["ok"], st
        assert st["raw"] == st["want"] == 2718
    finally:
        timeread._CALIB = old
