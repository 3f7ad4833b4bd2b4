"""Pallas kernel golden tests (interpret mode on CPU) — the kernels must
bit-match their XLA reference implementations."""

import jax.numpy as jnp
import numpy as np

from badslam_tpu.ops.pallas_kernels import bilateral_filter_and_cutoff_pallas
from badslam_tpu.ops.preprocess import bilateral_filter_and_cutoff


def test_bilateral_pallas_matches_xla():
    rng = np.random.default_rng(0)
    d = rng.uniform(0.5, 3.0, (120, 160)).astype(np.float32)
    d[rng.uniform(size=d.shape) < 0.15] = 0.0
    d[rng.uniform(size=d.shape) < 0.05] = 5.0  # beyond max_depth cutoff
    ref = np.asarray(bilateral_filter_and_cutoff(jnp.array(d), 2.5))
    for block_h in (16, 48, 120):
        out = np.asarray(bilateral_filter_and_cutoff_pallas(
            jnp.array(d), 2.5, block_h=block_h, interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_bilateral_pallas_nondivisible_height():
    rng = np.random.default_rng(1)
    d = rng.uniform(0.5, 3.0, (67, 160)).astype(np.float32)
    ref = np.asarray(bilateral_filter_and_cutoff(jnp.array(d), 20.0))
    out = np.asarray(bilateral_filter_and_cutoff_pallas(
        jnp.array(d), 20.0, block_h=32, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)
