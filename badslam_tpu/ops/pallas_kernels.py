"""Pallas TPU kernels for hot per-frame ops + block-shape autotuner.

The reference runs every image op as a CUDA kernel with a persisted
block-size autotuner (libvis/src/libvis/cuda/cuda_auto_tuner.h:44-204 and
applications/badslam/scripts/auto_tune_parameters.py). Here the hot
stencil — the joint bilateral depth filter + max-depth cutoff
(BilateralFilteringAndDepthCutoffCUDAKernel,
cuda_depth_processing.cu:42-98) — is a Pallas kernel that tiles the image
into VMEM row-blocks with halo rows, so the 49-tap inverse-depth kernel
reads every pixel once from HBM; the XLA version materializes 49 shifted
copies through jnp.pad.

Block heights are chosen by `autotune_block_height`, which sweeps
candidates and persists the best per (H, W, dtype) in
~/.cache/badslam_tpu/auto_tuning_result.json (the reference's
auto_tuning_result.txt analog).
"""

from __future__ import annotations

import functools
import json
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from badslam_tpu.ops import autotune as tuner

_DEFAULT_BLOCK_H = 64


def tuned_block_height(h: int, w: int) -> int:
    key = tuner.backend_key(f"bilateral_{h}x{w}")
    v = tuner.get(key)
    if v is None:  # round-1 entries were unscoped
        v = tuner.get(f"bilateral_{h}x{w}", _DEFAULT_BLOCK_H)
    return int(v)


def tuned_bilateral_impl(h: int, w: int) -> Optional[bool]:
    """Persisted Pallas-vs-XLA choice for the bilateral filter at this
    shape, or None if never tuned (True = Pallas)."""
    v = tuner.get(tuner.backend_key(f"bilateral_impl_{h}x{w}"))
    if v is None:
        return None
    return v == "pallas"


def _bilateral_kernel(depth_ref, out_ref, *, radius: int, block_h: int,
                      max_depth: float, denom_xy: float, denom_value: float):
    """One grid step = one row-block. The (small) padded image lives whole
    in VMEM; each step reads its block plus halo rows with a dynamic slice
    (overlapping windows are not expressible as Blocked index_maps)."""
    i = pl.program_id(0)
    d = depth_ref[pl.ds(i * block_h, block_h + 2 * radius), :]
    w = d.shape[1]
    center = d[radius:radius + block_h, :]
    center_valid = (center > 0) & (center <= max_depth)
    inv_center = 1.0 / jnp.where(center_valid, center, 1.0)

    weight_sum = jnp.zeros((block_h, w), jnp.float32)
    value_sum = jnp.zeros((block_h, w), jnp.float32)
    radius_sq = radius * radius
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_h, w), 1)
    for dy in range(-radius, radius + 1):
        row = d[radius + dy:radius + dy + block_h, :]
        for dx in range(-radius, radius + 1):
            grid_dist_sq = dx * dx + dy * dy
            if grid_dist_sq > radius_sq:
                continue
            if dx == 0:
                sample = row
                edge_ok = True
            else:
                # out[y, x] = in[y, x + dx]: circular lane shift + mask of
                # the wrapped columns (Mosaic has no unaligned lane concat).
                sample = pltpu.roll(row, (-dx) % w, 1)
                edge_ok = ((cols < w - dx) if dx > 0 else (cols >= -dx))
            sample_valid = (sample > 0) & edge_ok
            inv_sample = 1.0 / jnp.where(sample_valid, sample, 1.0)
            diff = inv_center - inv_sample
            wgt = jnp.where(
                sample_valid,
                jnp.exp(-grid_dist_sq / denom_xy
                        - (diff * diff) / denom_value),
                0.0,
            )
            weight_sum = weight_sum + wgt
            value_sum = value_sum + wgt * inv_sample
    out = jnp.where(
        weight_sum > 0, weight_sum / jnp.maximum(value_sum, 1e-30), 0.0)
    out_ref[:] = jnp.where(center_valid, out, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "sigma_xy", "radius_factor",
                     "sigma_inv_depth", "block_h", "interpret"),
)
def bilateral_filter_and_cutoff_pallas(
    depth: jax.Array,
    max_depth: float,
    sigma_xy: float = 1.5,
    radius_factor: float = 2.0,
    sigma_inv_depth: float = 0.005,
    block_h: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ops.preprocess.bilateral_filter_and_cutoff."""
    h, w = depth.shape
    radius = int(radius_factor * sigma_xy + 0.5)
    if block_h is None:
        block_h = tuned_block_height(h, w)
    block_h = min(block_h, h)

    # Pad to a multiple of block_h rows plus halo on both sides.
    hb = pl.cdiv(h, block_h) * block_h
    padded = jnp.pad(depth.astype(jnp.float32),
                     ((radius, hb - h + radius), (0, 0)))

    kernel = functools.partial(
        _bilateral_kernel,
        radius=radius, block_h=block_h, max_depth=float(max_depth),
        denom_xy=2.0 * sigma_xy * sigma_xy,
        denom_value=2.0 * sigma_inv_depth * sigma_inv_depth,
    )
    out = pl.pallas_call(
        kernel,
        grid=(hb // block_h,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (block_h, w), index_map=lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((hb, w), jnp.float32),
        interpret=interpret,
    )(padded)
    return out[:h]


def autotune_block_height(
    h: int, w: int,
    candidates=(16, 32, 48, 64, 96, 128),
    max_depth: float = 20.0,
    iterations: int = 10,
) -> int:
    """Sweep block heights for the bilateral kernel on the current device,
    persist and return the fastest (CUDAAutoTuner analog)."""
    import time

    import numpy as np

    depth = jnp.array(
        np.random.default_rng(0).uniform(0.5, 3.0, (h, w)).astype(np.float32))
    best = tuner.autotune(
        f"bilateral_{h}x{w}",
        {
            str(bh): functools.partial(
                bilateral_filter_and_cutoff_pallas, depth,
                max_depth=max_depth, block_h=bh)
            for bh in candidates if bh <= h
        },
        iterations=iterations,
    )
    return int(best) if best is not None else _DEFAULT_BLOCK_H


def autotune_bilateral_impl(
    h: int, w: int, max_depth: float = 20.0, iterations: int = 10,
) -> Optional[bool]:
    """Pallas (with the tuned block height) vs the XLA-fused fallback for
    this shape on the current device; persists the winner. Returns True
    for Pallas (implementation-selection analog of the reference tuning
    every kernel launch)."""
    import numpy as np

    from badslam_tpu.ops.preprocess import bilateral_filter_and_cutoff

    depth = jnp.array(
        np.random.default_rng(0).uniform(0.5, 3.0, (h, w)).astype(np.float32))
    best = tuner.autotune(
        f"bilateral_impl_{h}x{w}",
        {
            "pallas": functools.partial(
                bilateral_filter_and_cutoff_pallas, depth,
                max_depth=max_depth),
            "xla": functools.partial(
                bilateral_filter_and_cutoff, depth, max_depth),
        },
        iterations=iterations,
    )
    return None if best is None else best == "pallas"


def autotune_preprocess(h: int, w: int, max_depth: float = 20.0) -> None:
    """Tune every preprocessing decision for one image shape: the Pallas
    block height, then the Pallas-vs-XLA choice."""
    autotune_block_height(h, w, max_depth=max_depth)
    autotune_bilateral_impl(h, w, max_depth=max_depth)
