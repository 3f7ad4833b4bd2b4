"""Image gather / bilinear interpolation utilities (texture-unit substitutes).

TPUs have no texture units; the reference's tex2D reads
(/root/reference/applications/badslam/src/badslam/cost_function.cuh:191-254)
become explicit gathers here. Coordinates use the pixel-corner convention
(texel centers at integer+0.5), address mode clamp-to-edge, matching CUDA
texture semantics used throughout the reference kernels.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gather_nearest(img: jax.Array, px: jax.Array, py: jax.Array) -> jax.Array:
    """img[py, px] for int32 index arrays (caller guarantees in-bounds)."""
    h, w = img.shape
    flat = img.reshape(-1)
    idx = py * w + px
    return jnp.take(flat, idx.reshape(-1), axis=0).reshape(px.shape)


def gather_quad(
    img: jax.Array, x: jax.Array, y: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fetch the 2x2 texel neighborhood of corner-convention coords (x, y).

    Returns (top_left, top_right, bottom_left, bottom_right, tx, ty) using the
    reference's truncation scheme (ix = int(max(0, x-0.5)); tx clamped to
    [0,1]); texel indices clamp to the image border.
    """
    h, w = img.shape
    fx = jnp.maximum(0.0, x - 0.5)
    fy = jnp.maximum(0.0, y - 0.5)
    ix = jnp.floor(fx).astype(jnp.int32)
    iy = jnp.floor(fy).astype(jnp.int32)
    tx = jnp.clip(fx - ix.astype(fx.dtype), 0.0, 1.0)
    ty = jnp.clip(fy - iy.astype(fy.dtype), 0.0, 1.0)
    ix0 = jnp.clip(ix, 0, w - 1)
    iy0 = jnp.clip(iy, 0, h - 1)
    ix1 = jnp.clip(ix + 1, 0, w - 1)
    iy1 = jnp.clip(iy + 1, 0, h - 1)
    tl = gather_nearest(img, ix0, iy0)
    tr = gather_nearest(img, ix1, iy0)
    bl = gather_nearest(img, ix0, iy1)
    br = gather_nearest(img, ix1, iy1)
    return tl, tr, bl, br, tx, ty


def bilinear(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear sample at corner-convention coords (tex2D equivalent)."""
    tl, tr, bl, br, tx, ty = gather_quad(img, x, y)
    top = tl + tx * (tr - tl)
    bottom = bl + tx * (br - bl)
    return top + ty * (bottom - top)


def bilinear_and_gradient(
    img: jax.Array, x: jax.Array, y: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(value, d/dx, d/dy) of the bilinear patch at corner coords (x, y).

    The gradient formulation matches DescriptorJacobianWrtProjectedPosition /
    ColorJacobianWrtProjectedPosition (cost_function.cuh:191-254, 322-352):
    dx = (br-bl)*ty + (tr-tl)*(1-ty); dy = (br-tr)*tx + (bl-tl)*(1-tx).
    Reuses one 4-texel gather for both value and gradient.
    """
    tl, tr, bl, br, tx, ty = gather_quad(img, x, y)
    top = tl + tx * (tr - tl)
    bottom = bl + tx * (br - bl)
    value = top + ty * (bottom - top)
    dx = (br - bl) * ty + (tr - tl) * (1.0 - ty)
    dy = (br - tr) * tx + (bl - tl) * (1.0 - tx)
    return value, dx, dy
