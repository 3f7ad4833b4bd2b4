"""Multi-resolution pyramid construction for direct tracking.

TPU rebuild of the reference's downsampling kernels
(/root/reference/applications/badslam/src/badslam/kernel_downsample.cu:107-160,
DownsampleImagesCUDAKernel): per 2x2 block, depth is the sample closest to
the mean of the valid samples (occlusion-aware, avoids inventing depths at
discontinuities), the normal follows the chosen depth sample, and intensity
is the average of the 4 pixels (bilinear tap at the block center).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class FramePyramidLevel(NamedTuple):
    depth: jax.Array      # [H, W] f32, 0 invalid
    nx: jax.Array         # [H, W]
    ny: jax.Array         # [H, W]
    intensity: jax.Array  # [H, W] in [0, 1]


def _blocks(img: jax.Array) -> jax.Array:
    """[H, W] -> [H/2, W/2, 4] of 2x2 blocks (order: TL, TR, BL, BR)."""
    h, w = img.shape
    b = img[: (h // 2) * 2, : (w // 2) * 2].reshape(h // 2, 2, w // 2, 2)
    return b.transpose(0, 2, 1, 3).reshape(h // 2, w // 2, 4)


def downsample_level(level: FramePyramidLevel) -> FramePyramidLevel:
    d4 = _blocks(level.depth)
    valid = d4 > 0
    count = jnp.sum(valid, axis=-1)
    depth_sum = jnp.sum(jnp.where(valid, d4, 0.0), axis=-1)
    mean = depth_sum / jnp.maximum(count, 1)
    dist = jnp.where(valid, jnp.abs(d4 - mean[..., None]), jnp.inf)
    idx = jnp.argmin(dist, axis=-1)

    def select(img4):
        return jnp.take_along_axis(img4, idx[..., None], axis=-1)[..., 0]

    any_valid = count > 0
    depth = jnp.where(any_valid, select(d4), 0.0)
    nx = jnp.where(any_valid, select(_blocks(level.nx)), 0.0)
    ny = jnp.where(any_valid, select(_blocks(level.ny)), 0.0)
    # Intensity: average of the 4 pixels, then re-quantize to the u8 grid as
    # the reference's `255.f * color + 0.5f` u8 write does.
    inten = jnp.mean(_blocks(level.intensity), axis=-1)
    inten = jnp.floor(inten * 255.0 + 0.5) * (1.0 / 255.0)
    return FramePyramidLevel(depth, nx, ny, inten)


@functools.partial(jax.jit, static_argnames=("num_scales", "gradmag"))
def build_pyramid(
    depth: jax.Array,
    nx: jax.Array,
    ny: jax.Array,
    intensity: jax.Array,
    num_scales: int,
    gradmag: bool = False,
) -> Tuple[FramePyramidLevel, ...]:
    """Finest-first tuple of `num_scales` levels (static shapes per level).

    With `gradmag`, the full-resolution Sobel gradient magnitude replaces
    the intensity plane BEFORE pyramid construction, so coarser levels are
    downsampled gradmag — exactly the reference's flow: the gradmag texture
    is fed through DownsampleImagesCUDA as the color channel
    (pairwise_frame_tracking.cc:293-344, bad_slam.h:275-280)."""
    if gradmag:
        from badslam_tpu.ops.preprocess import (
            compute_sobel_gradient_magnitude,
        )

        intensity = compute_sobel_gradient_magnitude(intensity)
    levels: List[FramePyramidLevel] = [FramePyramidLevel(depth, nx, ny, intensity)]
    for _ in range(num_scales - 1):
        levels.append(downsample_level(levels[-1]))
    return tuple(levels)
