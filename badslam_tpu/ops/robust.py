"""Robust loss weighting (Tukey / Huber).

Semantics match /root/reference/applications/badslam/src/badslam/
robust_weighting.cuh:39-86 — weight = (1/r) d rho(r) / d r.
"""

from __future__ import annotations

import jax.numpy as jnp

# Constants from the reference cost model
# (/root/reference/applications/badslam/src/badslam/cost_function.cuh:41-110).
DEPTH_RESIDUAL_WEIGHT = 1.0
DEPTH_TUKEY_PARAM = 10.0
DEPTH_UNCERTAINTY_EMPIRICAL_FACTOR = 0.1
DESCRIPTOR_RESIDUAL_WEIGHT = 1e-2
DESCRIPTOR_HUBER_PARAM = 10.0
# cos(40 deg) normal compatibility gate
# (/root/reference/applications/badslam/src/badslam/kernels.cuh:58).
COS_NORMAL_COMPATIBILITY_THRESHOLD = 0.76604


def tukey_weight(r, param):
    quot = r / param
    term = 1.0 - quot * quot
    return jnp.where(jnp.abs(r) < param, term * term, 0.0)


def tukey_residual(r, param):
    quot = r / param
    term = 1.0 - quot * quot
    inside = (param * param / 6.0) * (1.0 - term * term * term)
    return jnp.where(jnp.abs(r) < param, inside, param * param / 6.0)


def huber_weight(r, param):
    abs_r = jnp.abs(r)
    return jnp.where(abs_r < param, 1.0, param / jnp.maximum(abs_r, 1e-30))


def huber_residual(r, param):
    abs_r = jnp.abs(r)
    return jnp.where(
        abs_r < param, 0.5 * r * r, param * (abs_r - 0.5 * param)
    )


def depth_residual_weight(r, scaling=1.0):
    return DEPTH_RESIDUAL_WEIGHT * tukey_weight(r, scaling * DEPTH_TUKEY_PARAM)


def weighted_depth_residual(r, scaling=1.0):
    return DEPTH_RESIDUAL_WEIGHT * tukey_residual(r, scaling * DEPTH_TUKEY_PARAM)


def descriptor_residual_weight(r, scaling=1.0):
    return scaling * DESCRIPTOR_RESIDUAL_WEIGHT * huber_weight(r, DESCRIPTOR_HUBER_PARAM)


def weighted_descriptor_residual(r, scaling=1.0):
    return scaling * DESCRIPTOR_RESIDUAL_WEIGHT * huber_residual(r, DESCRIPTOR_HUBER_PARAM)


def depth_residual_inv_stddev(nx, ny, depth, local_normal, baseline_fx):
    """Inverse std-dev of the depth residual (propagated stereo uncertainty).

    sigma = 0.1 * |n_x*nx + n_y*ny + n_z| * depth^2 / baseline_fx
    (cost_function.cuh:81-97).
    """
    denom = (
        DEPTH_UNCERTAINTY_EMPIRICAL_FACTOR
        * jnp.abs(local_normal[..., 0] * nx + local_normal[..., 1] * ny + local_normal[..., 2])
        * (depth * depth)
    )
    return baseline_fx / jnp.maximum(denom, 1e-12)


def depth_residual_stddev(nx, ny, depth, local_normal, baseline_fx):
    return (
        DEPTH_UNCERTAINTY_EMPIRICAL_FACTOR
        * jnp.abs(local_normal[..., 0] * nx + local_normal[..., 1] * ny + local_normal[..., 2])
        * (depth * depth)
    ) / baseline_fx
