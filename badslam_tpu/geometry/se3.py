"""SE(3) Lie-group math on quaternion + translation pairs.

Functional analog of the Sophus SE3 types used throughout the reference
(/root/reference/libvis/src/libvis/sophus.h); tangent-vector ordering is
[translation(3), rotation(3)], matching the 6-vector solved for by the
reference's Gauss-Newton pose steps (e.g.
/root/reference/applications/badslam/src/badslam/pairwise_frame_tracking.cc:561-585,
update `T * exp(-x)` with x = [upsilon, omega]).

A pose is a pair ``(q, t)`` where ``q`` is a unit quaternion stored as
``[w, x, y, z]`` with shape ``[..., 4]`` and ``t`` a translation ``[..., 3]``.
All functions broadcast over leading batch dimensions and are jit/vmap-safe.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SE3(NamedTuple):
    """Rigid transform; acts on points as ``R(q) @ p + t``."""

    q: jax.Array  # [..., 4] unit quaternion, wxyz
    t: jax.Array  # [..., 3]

    @property
    def dtype(self):
        return self.q.dtype


def identity(batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> SE3:
    q = jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype), batch_shape + (4,)
    )
    t = jnp.zeros(batch_shape + (3,), dtype=dtype)
    return SE3(q, t)


# ---------------------------------------------------------------------------
# Quaternion primitives
# ---------------------------------------------------------------------------


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by quaternion(s) q (Rodrigues via quat algebra)."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    # v' = v + 2*qv x (qv x v + qw*v)
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv + qw * v)
    return v + 2.0 * uuv


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def slerp(qa: jax.Array, qb: jax.Array, f) -> jax.Array:
    """Spherical interpolation between unit quaternions (branch-free device
    analog of se3_np.slerp; Eigen Quaternion::slerp semantics as used by
    trajectory_deformation.cc:109-118). `f` broadcasts against [..., 4]."""
    d = jnp.sum(qa * qb, axis=-1, keepdims=True)
    qb = jnp.where(d < 0, -qb, qb)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    close = d > 0.9995
    safe_sin = jnp.where(close, 1.0, jnp.sin(theta))
    wa = jnp.where(close, 1.0 - f, jnp.sin((1.0 - f) * theta) / safe_sin)
    wb = jnp.where(close, f, jnp.sin(f * theta) / safe_sin)
    return quat_normalize(wa * qa + wb * qb)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """[..., 4] -> [..., 3, 3] rotation matrix."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """[..., 3, 3] -> [..., 4] quaternion, wxyz. Branch-free (Shepperd)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best via where-chains.
    qw0 = jnp.sqrt(jnp.maximum(0.0, 1.0 + tr)) / 2
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0 + 1e-30), (m02 - m20) / (4 * qw0 + 1e-30),
         (m10 - m01) / (4 * qw0 + 1e-30)], axis=-1)

    qx1 = jnp.sqrt(jnp.maximum(1e-30, 1.0 + m00 - m11 - m22)) / 2
    q1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
         (m02 + m20) / (4 * qx1)], axis=-1)

    qy2 = jnp.sqrt(jnp.maximum(1e-30, 1.0 - m00 + m11 - m22)) / 2
    q2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
         (m12 + m21) / (4 * qy2)], axis=-1)

    qz3 = jnp.sqrt(jnp.maximum(1e-30, 1.0 - m00 - m11 + m22)) / 2
    q3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
         (m12 + m21) / (4 * qz3), qz3], axis=-1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 > m11) & (m00 > m22))[..., None]
    cond2 = (m11 > m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SE(3) operations
# ---------------------------------------------------------------------------


def mul(a: SE3, b: SE3) -> SE3:
    """Compose: (a*b)(p) = a(b(p))."""
    return SE3(quat_normalize(quat_mul(a.q, b.q)), quat_rotate(a.q, b.t) + a.t)


def inverse(a: SE3) -> SE3:
    qi = quat_conj(a.q)
    return SE3(qi, -quat_rotate(qi, a.t))


def act(a: SE3, p: jax.Array) -> jax.Array:
    """Apply transform to point(s) p [..., 3]."""
    return quat_rotate(a.q, p) + a.t


def to_matrix(a: SE3) -> jax.Array:
    """[..., 3, 4] matrix."""
    return jnp.concatenate([quat_to_matrix(a.q), a.t[..., None]], axis=-1)


def to_matrix4(a: SE3) -> jax.Array:
    m = to_matrix(a)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=m.dtype), m.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([m, bottom], axis=-2)


def from_matrix(m: jax.Array) -> SE3:
    """[..., 3, 4] or [..., 4, 4] -> SE3."""
    return SE3(matrix_to_quat(m[..., :3, :3]), m[..., :3, 3])


def _so3_exp(omega: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (quaternion, theta_sq, theta). Taylor-safe near zero."""
    theta_sq = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta_sq)
    half = 0.5 * theta
    small = theta_sq < 1e-8
    # sin(x/2)/x and cos(x/2)
    sinc_half = jnp.where(
        small, 0.5 - theta_sq / 48.0, jnp.sin(half) / jnp.where(small, 1.0, theta)
    )
    cos_half = jnp.cos(half)
    q = jnp.concatenate([cos_half[..., None], sinc_half[..., None] * omega], axis=-1)
    return quat_normalize(q), theta_sq, theta


def exp(xi: jax.Array) -> SE3:
    """se(3) exponential. xi = [..., 6] = [translation v, rotation w]."""
    v = xi[..., 0:3]
    omega = xi[..., 3:6]
    q, theta_sq, theta = _so3_exp(omega)

    small = theta_sq < 1e-8
    safe_theta_sq = jnp.where(small, 1.0, theta_sq)
    safe_theta = jnp.where(small, 1.0, theta)
    # V = I + (1-cos)/t^2 W + (t-sin)/t^3 W^2
    a = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / safe_theta_sq)
    b = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0,
        (theta - jnp.sin(theta)) / (safe_theta_sq * safe_theta),
    )
    wxv = jnp.cross(omega, v)
    wxwxv = jnp.cross(omega, wxv)
    t = v + a[..., None] * wxv + b[..., None] * wxwxv
    return SE3(q, t)


def log(T: SE3) -> jax.Array:
    """SE(3) log map -> [..., 6] = [v, w]."""
    q = T.q
    # SO(3) log
    qw = q[..., 0]
    qv = q[..., 1:4]
    n = jnp.linalg.norm(qv, axis=-1)
    # Handle q ~ -q ambiguity: use atan2 of (n, qw); theta in [0, pi]
    theta = 2.0 * jnp.arctan2(n, qw)
    # wrap to [-pi, pi]
    theta = jnp.where(theta > jnp.pi, theta - 2 * jnp.pi, theta)
    small = n < 1e-8
    scale = jnp.where(small, 2.0 / jnp.where(jnp.abs(qw) < 1e-12, 1.0, qw), theta / jnp.where(small, 1.0, n))
    omega = scale[..., None] * qv

    theta_sq = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta_sq)
    small = theta_sq < 1e-8
    safe_theta_sq = jnp.where(small, 1.0, theta_sq)
    safe_theta = jnp.where(small, 1.0, theta)
    half = 0.5 * safe_theta
    # V^{-1} = I - 1/2 W + c W^2 with c = (1 - theta*cos(half)/(2 sin(half)))/theta^2
    c = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - safe_theta * jnp.cos(half) / (2.0 * jnp.sin(half))) / safe_theta_sq,
    )
    t = T.t
    wxt = jnp.cross(omega, t)
    wxwxt = jnp.cross(omega, wxt)
    v = t - 0.5 * wxt + c[..., None] * wxwxt
    return jnp.concatenate([v, omega], axis=-1)


def right_multiply_exp(T: SE3, xi: jax.Array) -> SE3:
    """T * exp(xi) — the pose-update step used by all GN solvers here."""
    return mul(T, exp(xi))


def interpolate(a: SE3, b: SE3, alpha) -> SE3:
    """Pose interpolation: translation lerp + quaternion slerp.

    Matches the correction interpolation in the reference's trajectory
    deformation (/root/reference/applications/badslam/src/badslam/
    trajectory_deformation.cc:80-109).
    """
    alpha = jnp.asarray(alpha, dtype=a.q.dtype)
    t = (1.0 - alpha)[..., None] * a.t + alpha[..., None] * b.t if alpha.ndim else (1.0 - alpha) * a.t + alpha * b.t
    # slerp with sign correction
    dot = jnp.sum(a.q * b.q, axis=-1, keepdims=True)
    bq = jnp.where(dot < 0, -b.q, b.q)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    w_a = jnp.where(small, 1.0 - alpha, jnp.sin((1.0 - alpha) * theta) / jnp.where(small, 1.0, sin_theta))
    w_b = jnp.where(small, alpha, jnp.sin(alpha * theta) / jnp.where(small, 1.0, sin_theta))
    q = quat_normalize(w_a * a.q + w_b * bq)
    return SE3(q, t)


def stack(poses) -> SE3:
    """Stack a python list of SE3 into a batched SE3."""
    return SE3(jnp.stack([p.q for p in poses]), jnp.stack([p.t for p in poses]))
