"""Small fixed-size linear algebra helpers.

JAX's default matmul precision truncates inputs to bfloat16 (including
[N,3] @ [3,3] point transforms — an identity rotation then costs ~1e-3
relative error, fatal for Gauss-Newton geometry). These helpers expand
3-vector transforms into exact-f32 elementwise VPU ops — which is also the
right hardware mapping: tiny-K matmuls waste the MXU.

Use `highp` around any remaining genuine matmuls (GN H/b reductions,
batched solves) to force float32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def highp(fn):
    """Decorator: trace `fn` under float32 matmul precision."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapper


def rotate3(R: jax.Array, v: jax.Array) -> jax.Array:
    """[3,3] rotation applied to [..., 3] vectors, elementwise-exact."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [
            R[0, 0] * x + R[0, 1] * y + R[0, 2] * z,
            R[1, 0] * x + R[1, 1] * y + R[1, 2] * z,
            R[2, 0] * x + R[2, 1] * y + R[2, 2] * z,
        ],
        axis=-1,
    )


def transform3(R: jax.Array, t: jax.Array, v: jax.Array) -> jax.Array:
    """R v + t for [..., 3] vectors."""
    return rotate3(R, v) + t


def rotate_planes(R: jax.Array, x, y, z):
    """Rotation applied to three coordinate planes (any shape)."""
    return (
        R[0, 0] * x + R[0, 1] * y + R[0, 2] * z,
        R[1, 0] * x + R[1, 1] * y + R[1, 2] * z,
        R[2, 0] * x + R[2, 1] * y + R[2, 2] * z,
    )


def transform_planes(R: jax.Array, t: jax.Array, x, y, z):
    ox, oy, oz = rotate_planes(R, x, y, z)
    return ox + t[0], oy + t[1], oz + t[2]


def solve_psd(H: jax.Array, b: jax.Array) -> jax.Array:
    """Solve H x = b for small symmetric positive-definite H (f32-exact).

    Unrolled Cholesky — avoids LAPACK/matmul paths whose precision depends
    on global configuration, and runs as pure VPU scalar ops on TPU.
    """
    n = H.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = H[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
        for i in range(j + 1, n):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s / L[j][j]
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)
