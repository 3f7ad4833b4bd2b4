"""Per-frame RGB-D preprocessing as fused XLA programs.

TPU-native rebuild of the reference's depth/color preprocessing CUDA kernels
(/root/reference/applications/badslam/src/badslam/cuda_depth_processing.cu,
cuda_image_processing.cu). All stages are elementwise / small-stencil maps
over [H, W] planes, expressed so XLA fuses them into one pass; invalid pixels
are represented by depth == 0 (instead of the reference's kInvalidDepthBit
u16 tagging) and normals are kept at full f32 precision (the reference packs
to 8-bit signed, util.cuh:133-146 — a quantization we deliberately drop).

Conventions:
  * depth planes are f32 metric meters, 0 = invalid.
  * intensity planes are f32 in [0, 1] (u8-quantized grid to match the
    reference's normalized texture reads).
  * normals are stored as (nx, ny) planes; nz = -sqrt(max(0, 1-nx^2-ny^2)).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry.camera import PinholeCamera


class ProcessedFrame(NamedTuple):
    """All derived per-frame data used by tracking / BA (finest scale)."""

    depth: jax.Array      # [H, W] f32 CALIBRATED meters, 0 = invalid
    nx: jax.Array         # [H, W] f32 image-space normal x
    ny: jax.Array         # [H, W] f32 image-space normal y
    radius2: jax.Array    # [H, W] f32 squared point radius (0 where invalid)
    intensity: jax.Array  # [H, W] f32 in [0, 1]
    # Filtered metric depth BEFORE the deformation model — kept so keyframes
    # can be re-calibrated when self-calibration updates (a, cfactor)
    # (the reference keeps raw u16 depth per keyframe, keyframe.h:50-237).
    raw_depth: jax.Array | None = None
    # Original color image [H, W, 3] u8 — retained so keyframes keep a color
    # plane for surfel color assignment (the reference keeps a color texture
    # per keyframe, keyframe.h:163-170). None for intensity-only inputs.
    rgb: jax.Array | None = None


def shift2d(img: jax.Array, dy: int, dx: int, fill=0.0) -> jax.Array:
    """Shifted view: out[y, x] = img[y + dy, x + dx], `fill` outside."""
    h, w = img.shape
    pad_top = max(0, -dy)
    pad_bottom = max(0, dy)
    pad_left = max(0, -dx)
    pad_right = max(0, dx)
    padded = jnp.pad(
        img,
        ((pad_top, pad_bottom), (pad_left, pad_right)),
        constant_values=fill,
    )
    return jax.lax.dynamic_slice(padded, (pad_top + dy, pad_left + dx), (h, w))


def compute_brightness(rgb: jax.Array) -> jax.Array:
    """RGB u8 [H, W, 3] -> intensity f32 [0, 1] (Rec.601 luma, u8-quantized).

    Matches ComputeBrightnessKernel (cuda_image_processing.cu:165-176).
    """
    rgbf = rgb.astype(jnp.float32)
    luma = 0.299 * rgbf[..., 0] + 0.587 * rgbf[..., 1] + 0.114 * rgbf[..., 2]
    return jnp.floor(luma + 0.5) * (1.0 / 255.0)


def calibrate_depth(
    raw_depth: jax.Array,
    raw_to_float_depth: float,
    a: jax.Array | float = 0.0,
    cfactor: Optional[jax.Array] = None,
    cell_size: int = 4,
) -> jax.Array:
    """u16 raw depth -> calibrated metric depth (0 stays invalid).

    Depth deformation model 1/(1/d + cfactor*exp(-a/d))
    (/root/reference/applications/badslam/src/badslam/util.cuh:62-79).
    `cfactor` is the per-cell deformation grid; None or all-zeros = identity.
    """
    d = raw_depth.astype(jnp.float32) * raw_to_float_depth
    valid = raw_depth > 0
    if cfactor is None:
        calibrated = d
        a_arr = jnp.asarray(a, jnp.float32)
        if a_arr.ndim or float(a_arr) != 0.0:
            inv_d = 1.0 / jnp.where(valid, d, 1.0)
            calibrated = 1.0 / (inv_d + 0.0 * jnp.exp(-a_arr * inv_d))
    else:
        h, w = raw_depth.shape
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) // cell_size
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) // cell_size
        cf = cfactor[ys, xs]
        inv_d = 1.0 / jnp.where(valid, d, 1.0)
        calibrated = 1.0 / (inv_d + cf * jnp.exp(-jnp.asarray(a, jnp.float32) * inv_d))
    return jnp.where(valid, calibrated, 0.0)


def apply_depth_deformation(
    depth: jax.Array,
    a: jax.Array | float = 0.0,
    cfactor: Optional[jax.Array] = None,
    cell_size: int = 4,
) -> jax.Array:
    """Metric-depth version of the deformation model (0 stays invalid)."""
    valid = depth > 0
    inv_d = 1.0 / jnp.where(valid, depth, 1.0)
    if cfactor is None:
        cf = 0.0
    else:
        h, w = depth.shape
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) // cell_size
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) // cell_size
        cf = cfactor[ys, xs]
    out = 1.0 / (inv_d + cf * jnp.exp(-jnp.asarray(a, jnp.float32) * inv_d))
    return jnp.where(valid, out, 0.0)


def bilateral_filter_and_cutoff(
    depth: jax.Array,
    max_depth: float,
    sigma_xy: float = 1.5,
    radius_factor: float = 2.0,
    sigma_inv_depth: float = 0.005,
) -> jax.Array:
    """Bilateral filter on inverse depth + max-depth cutoff.

    Semantics of BilateralFilteringAndDepthCutoffCUDAKernel
    (cuda_depth_processing.cu:42-98): Gaussian in pixel distance and in
    inverse-depth difference to the center pixel; invalid (0) samples are
    skipped; center invalid or beyond max_depth -> invalid output.
    """
    radius = int(radius_factor * sigma_xy + 0.5)
    radius_sq = radius * radius
    denom_xy = 2.0 * sigma_xy * sigma_xy
    denom_value = 2.0 * sigma_inv_depth * sigma_inv_depth

    center_valid = (depth > 0) & (depth <= max_depth)
    inv_center = 1.0 / jnp.where(center_valid, depth, 1.0)

    weight_sum = jnp.zeros_like(depth)
    value_sum = jnp.zeros_like(depth)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            grid_dist_sq = dx * dx + dy * dy
            if grid_dist_sq > radius_sq:
                continue
            sample = shift2d(depth, dy, dx)
            sample_valid = sample > 0
            inv_sample = 1.0 / jnp.where(sample_valid, sample, 1.0)
            diff = inv_center - inv_sample
            w = jnp.where(
                sample_valid,
                jnp.exp(-grid_dist_sq / denom_xy - (diff * diff) / denom_value),
                0.0,
            )
            weight_sum = weight_sum + w
            value_sum = value_sum + w * inv_sample
    out = jnp.where(weight_sum > 0, weight_sum / jnp.maximum(value_sum, 1e-30), 0.0)
    return jnp.where(center_valid, out, 0.0)


def _unproject_planes(cam: PinholeCamera, depth: jax.Array):
    h, w = depth.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(depth.dtype)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(depth.dtype)
    px = depth * (cam.fx_inv * xs + cam.cx_inv)
    py = depth * (cam.fy_inv * ys + cam.cy_inv)
    return px, py, depth


def compute_normals(
    cam: PinholeCamera, depth: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Central-difference normals with occlusion-aware side selection.

    Returns (out_depth, nx, ny); pixels lacking any of the 4 neighbors (or at
    the 1-px border) are invalidated, matching ComputeNormalsCUDAKernel
    (cuda_depth_processing.cu). nz is implicitly -sqrt(1 - nx^2 - ny^2).
    """
    h, w = depth.shape
    px, py, pz = _unproject_planes(cam, depth)

    def neighbor(dy, dx):
        d = shift2d(depth, dy, dx)
        return d, shift2d(px, dy, dx), shift2d(py, dy, dx)

    dl, lx, ly = neighbor(0, -1)
    dr, rx, ry = neighbor(0, 1)
    dt, tx, ty = neighbor(-1, 0)
    db, bx, by = neighbor(1, 0)

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (xs >= 1) & (ys >= 1) & (xs < w - 1) & (ys < h - 1)
    valid = (
        interior & (depth > 0) & (dl > 0) & (dr > 0) & (dt > 0) & (db > 0)
    )

    ratio_thr_sq = 4.0  # kRatioThreshold = 2

    def pick_pair(n1x, n1y, n1z, n2x, n2y, n2z):
        """Choose difference vector between two opposite neighbors.

        (n1 = left/bottom, n2 = right/top; returns n2-n1 if distances to
        center are comparable, else the difference on the closer side.)
        """
        d1_sq = (n1x - px) ** 2 + (n1y - py) ** 2 + (n1z - pz) ** 2
        d2_sq = (n2x - px) ** 2 + (n2y - py) ** 2 + (n2z - pz) ** 2
        ratio = d1_sq / jnp.maximum(d2_sq, 1e-30)
        both = (ratio < ratio_thr_sq) & (ratio > 1.0 / ratio_thr_sq)
        use_side1 = d1_sq < d2_sq
        vx = jnp.where(both, n2x - n1x, jnp.where(use_side1, px - n1x, n2x - px))
        vy = jnp.where(both, n2y - n1y, jnp.where(use_side1, py - n1y, n2y - py))
        vz = jnp.where(both, n2z - n1z, jnp.where(use_side1, pz - n1z, n2z - pz))
        return vx, vy, vz

    # left -> right
    ax, ay, az = pick_pair(lx, ly, dl, rx, ry, dr)
    # bottom -> top
    bx_, by_, bz_ = pick_pair(bx, by, db, tx, ty, dt)

    # normal = cross(left_to_right, bottom_to_top)
    nx = ay * bz_ - az * by_
    ny = az * bx_ - ax * bz_
    nz = ax * by_ - ay * bx_
    length = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    sign = jnp.where(cam.fy_inv < 0, -1.0, 1.0)  # traced intrinsics
    inv_len = sign / jnp.maximum(length, 1e-30)
    degenerate = length <= 1e-6
    nx = jnp.where(degenerate, 0.0, nx * inv_len)
    ny = jnp.where(degenerate, 0.0, ny * inv_len)

    out_depth = jnp.where(valid, depth, 0.0)
    nx = jnp.where(valid, nx, 0.0)
    ny = jnp.where(valid, ny, 0.0)
    return out_depth, nx, ny


def normal_z(nx: jax.Array, ny: jax.Array) -> jax.Array:
    """Reconstruct nz (camera-facing, negative) from the stored components."""
    return -jnp.sqrt(jnp.maximum(0.0, 1.0 - nx * nx - ny * ny))


def compute_radii_and_remove_isolated(
    cam: PinholeCamera, depth: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Squared point radius = min squared distance to 4-neighbor points.

    Pixels with fewer than 4 valid axis-neighbors are invalidated
    (ComputePointRadiiAndRemoveIsolatedPixelsCUDAKernel,
    cuda_depth_processing.cu:286-358; kMinNeighbors = 4).
    """
    px, py, pz = _unproject_planes(cam, depth)
    min_dist_sq = jnp.full_like(depth, jnp.inf)
    count = jnp.zeros(depth.shape, jnp.int32)
    for dy, dx in ((0, -1), (0, 1), (-1, 0), (1, 0)):
        nd = shift2d(depth, dy, dx)
        nx_ = shift2d(px, dy, dx)
        ny_ = shift2d(py, dy, dx)
        nvalid = nd > 0
        dist_sq = (nx_ - px) ** 2 + (ny_ - py) ** 2 + (nd - pz) ** 2
        min_dist_sq = jnp.minimum(
            min_dist_sq, jnp.where(nvalid, dist_sq, jnp.inf)
        )
        count = count + nvalid.astype(jnp.int32)
    valid = (depth > 0) & (count >= 4)
    radius2 = jnp.where(valid, min_dist_sq, 0.0)
    out_depth = jnp.where(valid, depth, 0.0)
    return out_depth, radius2


def compute_min_max_depth(depth: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(min, max) over valid pixels; (inf, 0) if none.

    Analog of ComputeMinMaxDepthCUDA (two-pass reduction in the reference;
    a single deterministic XLA reduction here)."""
    valid = depth > 0
    mn = jnp.min(jnp.where(valid, depth, jnp.inf))
    mx = jnp.max(jnp.where(valid, depth, 0.0))
    return mn, mx


@functools.partial(jax.jit, static_argnames=("max_depth", "sigma_xy",
                                             "radius_factor", "sigma_inv_depth",
                                             "cell_size", "use_pallas",
                                             "raw_to_float_depth",
                                             "median_iterations"))
def preprocess_frame(
    cam: PinholeCamera,
    depth_metric: jax.Array,
    rgb: jax.Array,
    max_depth: float = 3.0,
    sigma_xy: float = 1.5,
    radius_factor: float = 2.0,
    sigma_inv_depth: float = 0.005,
    a: jax.Array | float = 0.0,
    cfactor: Optional[jax.Array] = None,
    cell_size: int = 4,
    use_pallas: Optional[bool] = None,
    undistort_map: Optional[jax.Array] = None,
    raw_to_float_depth: Optional[float] = None,
    median_iterations: int = 0,
) -> ProcessedFrame:
    """Full preprocessing pipeline for one frame — single fused XLA program.

    Mirrors BadSlam::PreprocessFrame (bad_slam.cc:643-765): brightness,
    bilateral filter + cutoff, normals, radii/isolation — but fused into one
    device program instead of 4 kernel launches. With `undistort_map`
    ([H, W, 2] source-pixel lookup from a distorted camera model) the frame
    is remapped to the pinhole model first (nearest for depth, bilinear for
    color — UndistortImage semantics, undistortion.h:40-58).
    `median_iterations` runs the median-filter+densify passes ON DEVICE
    (the reference does them on the CPU before upload, bad_slam.cc:650-666
    with its own "TODO: Do this on the GPU"; the filter is scale-equivariant
    so metric-vs-u16 input makes no difference).
    """
    if raw_to_float_depth is not None:
        # Raw u16 depth uploaded as-is; the scale conversion runs on device
        # (saves a full-image host multiply per frame on the 1-core host).
        depth_metric = depth_metric.astype(jnp.float32) * raw_to_float_depth
    if undistort_map is not None:
        depth_metric = undistort_image(depth_metric, undistort_map,
                                       nearest=True)
        rgb = undistort_image(rgb.astype(jnp.float32), undistort_map)
    for _ in range(median_iterations):
        depth_metric = median_filter_and_densify(depth_metric)
    intensity = compute_brightness(rgb) if rgb.ndim == 3 else rgb
    if use_pallas is None:
        # Persisted autotune decision for this shape when available
        # (ops.autotune; trace-time host lookup), else the backend default.
        from badslam_tpu.ops.pallas_kernels import tuned_bilateral_impl

        use_pallas = tuned_bilateral_impl(*depth_metric.shape)
        if use_pallas is None:
            use_pallas = jax.default_backend() != "cpu"
    if use_pallas:
        from badslam_tpu.ops.pallas_kernels import (
            bilateral_filter_and_cutoff_pallas,
        )

        filtered = bilateral_filter_and_cutoff_pallas(
            depth_metric, max_depth, sigma_xy, radius_factor, sigma_inv_depth
        )
    else:
        filtered = bilateral_filter_and_cutoff(
            depth_metric, max_depth, sigma_xy, radius_factor, sigma_inv_depth
        )
    calibrated = apply_depth_deformation(filtered, a, cfactor, cell_size)
    d1, nx, ny = compute_normals(cam, calibrated)
    d2, radius2 = compute_radii_and_remove_isolated(cam, d1)
    # Normals of pixels invalidated by the radius step are zeroed for hygiene.
    keep = d2 > 0
    return ProcessedFrame(
        depth=d2,
        nx=jnp.where(keep, nx, 0.0),
        ny=jnp.where(keep, ny, 0.0),
        radius2=radius2,
        intensity=intensity,
        raw_depth=jnp.where(keep, filtered, 0.0),
        rgb=(rgb if rgb.dtype == jnp.uint8
             else jnp.clip(rgb + 0.5, 0, 255).astype(jnp.uint8))
        if rgb.ndim == 3 else None,
    )


def median_filter_and_densify(depth: jax.Array) -> jax.Array:
    """3x3 median filter + densification on raw depth (0 = invalid).

    Rebuild of MedianFilterAndDensifyDepthMap (preprocessing.cc:40-86):
    pixels with >= 2 valid values in their 3x3 neighborhood get the median
    of the valid values (even counts pick the middle element closer to the
    mean); others pass through. Vectorized via a fixed 9-slot sort network
    with invalid slots pushed to +inf.
    """
    big = jnp.float32(3.4e38)
    slots = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            v = shift2d(depth, dy, dx, fill=0.0)
            slots.append(jnp.where(v > 0, v, big))
    stack = jnp.stack(slots, axis=-1)            # [H, W, 9]
    count = jnp.sum(stack < big, axis=-1)        # valid neighbor count
    s = jnp.sort(stack, axis=-1)

    # Median of the first `count` sorted entries.
    mid_hi = count // 2                          # index of upper middle
    mid_lo = jnp.maximum(mid_hi - 1, 0)
    hi = jnp.take_along_axis(s, mid_hi[..., None], axis=-1)[..., 0]
    lo = jnp.take_along_axis(s, mid_lo[..., None], axis=-1)[..., 0]
    finite = jnp.where(stack < big, stack, 0.0)
    mean = jnp.sum(finite, axis=-1) / jnp.maximum(count, 1)
    even = (count % 2) == 0
    median = jnp.where(
        even & (jnp.abs(lo - mean) < jnp.abs(hi - mean)), lo, hi
    )
    return jnp.where(count >= 2, median, depth)


@jax.jit
def downscale_depth_median(depth: jax.Array) -> jax.Array:
    """Half-resolution depth: median of the valid (non-zero) samples in each
    2x2 block (DownscaleUsingMedianWhileExcluding(0) analog, used when
    pyramid_level_for_depth > 0, bad_slam.cc:668-677). For an even valid
    count the lower-middle sample is taken (an actual measurement, never an
    invented average across a depth discontinuity)."""
    h, w = depth.shape
    d4 = (depth[: (h // 2) * 2, : (w // 2) * 2]
          .reshape(h // 2, 2, w // 2, 2).transpose(0, 2, 1, 3)
          .reshape(h // 2, w // 2, 4))
    valid = d4 > 0
    count = jnp.sum(valid, axis=-1)
    s = jnp.sort(jnp.where(valid, d4, jnp.inf), axis=-1)
    mid = jnp.maximum((count + 1) // 2 - 1, 0)
    med = jnp.take_along_axis(s, mid[..., None], axis=-1)[..., 0]
    return jnp.where(count > 0, med, 0.0)


@jax.jit
def downscale_color(rgb: jax.Array) -> jax.Array:
    """Half-resolution color: 2x2 average (the reference's ImagePyramid
    path for pyramid_level_for_color > 0, bad_slam.cc:680-688)."""
    h, w = rgb.shape[:2]
    r4 = (rgb[: (h // 2) * 2, : (w // 2) * 2]
          .astype(jnp.float32)
          .reshape(h // 2, 2, w // 2, 2, -1).transpose(0, 2, 1, 3, 4)
          .reshape(h // 2, w // 2, 4, -1))
    out = jnp.mean(r4, axis=-2) + 0.5
    return out.astype(rgb.dtype) if rgb.dtype == jnp.uint8 \
        else (out - 0.5).astype(rgb.dtype)


def create_undistortion_map(
    distort_fn, undistorted_cam: PinholeCamera, height: int, width: int
):
    """[H, W, 2] map: for each undistorted pixel center, the source pixel
    coordinates in the distorted image (CreateUndistortionMap analog,
    undistortion.h:40-58). `distort_fn(nx, ny) -> (px, py)` implements the
    source camera's projection of normalized coords to pixel-corner coords.
    """
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    nx = undistorted_cam.fx_inv * xs.astype(jnp.float32) + undistorted_cam.cx_inv
    ny = undistorted_cam.fy_inv * ys.astype(jnp.float32) + undistorted_cam.cy_inv
    px, py = distort_fn(nx, ny)
    return jnp.stack([px, py], axis=-1)


def undistort_image(image: jax.Array, undistortion_map: jax.Array,
                    nearest: bool = False) -> jax.Array:
    """Remap an image through an undistortion map (UndistortImage analog).
    Bilinear for color/intensity; nearest for depth (`nearest=True`)."""
    from badslam_tpu.ops.interp import bilinear, gather_nearest

    h, w = image.shape[:2]
    px = undistortion_map[..., 0]
    py = undistortion_map[..., 1]
    inside = (px >= 0) & (py >= 0) & (px < w) & (py < h)
    if nearest:
        xi = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, h - 1)
        if image.ndim == 2:
            out = gather_nearest(image, xi, yi)
        else:
            out = image[yi, xi]
        return jnp.where(
            inside if image.ndim == 2 else inside[..., None], out, 0)
    if image.ndim == 2:
        out = bilinear(image, px, py)
        return jnp.where(inside, out, 0.0)
    chans = [bilinear(image[..., c], px, py) for c in range(image.shape[-1])]
    out = jnp.stack(chans, axis=-1)
    return jnp.where(inside[..., None], out, 0.0)


def radtan_distort_fn(cam: PinholeCamera, k1: float, k2: float,
                      p1: float = 0.0, p2: float = 0.0):
    """Radial-tangential (Brown) distortion projection for undistortion-map
    construction (the reference's RadtanCamera analog, camera.h)."""

    def fn(nx, ny):
        r2 = nx * nx + ny * ny
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        dx = 2.0 * p1 * nx * ny + p2 * (r2 + 2.0 * nx * nx)
        dy = p1 * (r2 + 2.0 * ny * ny) + 2.0 * p2 * nx * ny
        xd = nx * radial + dx
        yd = ny * radial + dy
        return cam.fx * xd + cam.cx, cam.fy * yd + cam.cy

    return fn


def compute_sobel_gradient_magnitude(intensity: jax.Array) -> jax.Array:
    """3x3 Sobel gradient magnitude of an intensity image, normalized to
    [0, 1] like the reference's precomputed gradmag textures
    (ComputeSobelGradientMagnitudeCUDAKernel, cuda_image_processing.cu)."""
    tl = shift2d(intensity, -1, -1)
    t = shift2d(intensity, -1, 0)
    tr = shift2d(intensity, -1, 1)
    l = shift2d(intensity, 0, -1)
    r = shift2d(intensity, 0, 1)
    bl = shift2d(intensity, 1, -1)
    b = shift2d(intensity, 1, 0)
    br = shift2d(intensity, 1, 1)
    gx = (tr + 2.0 * r + br) - (tl + 2.0 * l + bl)
    gy = (bl + 2.0 * b + br) - (tl + 2.0 * t + tr)
    # Max |g| for [0,1] inputs is 4*sqrt(2); normalize to keep [0,1].
    return jnp.sqrt(gx * gx + gy * gy) * (1.0 / (4.0 * jnp.sqrt(2.0)))
