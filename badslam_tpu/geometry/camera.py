"""Pinhole camera model with the pixel-corner / pixel-center conventions.

Equivalent in capability to the reference's ``PinholeCamera4f``
(/root/reference/libvis/src/libvis/camera.h:281-443) and the CUDA projector
helpers (/root/reference/applications/badslam/src/badslam/surfel_projection.cuh:40-126):

  * Parameters (fx, fy, cx, cy) use the **pixel-corner** origin convention:
    pixel (x, y) covers the unit square [x, x+1) x [y, y+1), its center being
    (x + 0.5, y + 0.5). Projection of a 3D point yields corner-convention
    float coordinates; flooring them gives the pixel index.
  * Unprojection of integer pixel indices uses the pixel **center**:
    nx(px) = (px + 0.5 - cx) / fx.

Scaling by 0.5 per pyramid level is exact in the corner convention
(fx, fy, cx, cy all scale by the factor).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PinholeCamera:
    """Pytree camera: fx/fy/cx/cy are DATA leaves (traced under jit — the
    intrinsics are optimization parameters during self-calibration, and
    tracing them avoids a full recompile cascade on every intrinsics
    update); width/height are STATIC metadata (shape-determining)."""

    fx: float
    fy: float
    cx: float  # pixel-corner convention
    cy: float
    width: int
    height: int

    def scaled(self, factor: float) -> "PinholeCamera":
        """Camera for an image scaled by `factor` (0.5 per pyramid level)."""
        return PinholeCamera(
            fx=self.fx * factor,
            fy=self.fy * factor,
            cx=self.cx * factor,
            cy=self.cy * factor,
            width=int(round(self.width * factor)),
            height=int(round(self.height * factor)),
        )

    def pyramid_level(self, level: int) -> "PinholeCamera":
        cam = self
        for _ in range(level):
            cam = PinholeCamera(
                fx=cam.fx * 0.5, fy=cam.fy * 0.5, cx=cam.cx * 0.5, cy=cam.cy * 0.5,
                width=cam.width // 2, height=cam.height // 2,
            )
        return cam

    # -- center-convention unprojection helpers (for integer pixel indices) --

    @property
    def fx_inv(self) -> float:
        return 1.0 / self.fx

    @property
    def fy_inv(self) -> float:
        return 1.0 / self.fy

    @property
    def cx_inv(self) -> float:
        # = -(cx_center)/fx with cx_center = cx - 0.5
        return -(self.cx - 0.5) / self.fx

    @property
    def cy_inv(self) -> float:
        return -(self.cy - 0.5) / self.fy

    def nx(self, px):
        """Normalized image x for pixel index (or float center coord) px."""
        return self.fx_inv * px + self.cx_inv

    def ny(self, py):
        return self.fy_inv * py + self.cy_inv

    def unproject(self, px, py, depth):
        """Unproject pixel indices + depth -> camera-frame 3D point [..., 3]."""
        return jnp.stack(
            [depth * self.nx(px), depth * self.ny(py), depth], axis=-1
        )

    def project(self, p):
        """Project camera-frame points [..., 3] -> corner-convention (x, y).

        Assumes z > 0 (callers mask). Returns [..., 2].
        """
        z = p[..., 2]
        inv_z = 1.0 / z
        return jnp.stack(
            [self.fx * p[..., 0] * inv_z + self.cx,
             self.fy * p[..., 1] * inv_z + self.cy],
            axis=-1,
        )

    def project_valid(self, p) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Project and bounds-check.

        Returns (pxy [..., 2] float corner coords, pixel indices [..., 2] int32,
        valid mask). Matches ProjectSurfelToImage semantics
        (/root/reference/applications/badslam/src/badslam/surfel_projection_nvcc_only.cuh).
        """
        z = p[..., 2]
        safe_z = jnp.where(z > 0, z, 1.0)
        pxy = jnp.stack(
            [self.fx * p[..., 0] / safe_z + self.cx,
             self.fy * p[..., 1] / safe_z + self.cy],
            axis=-1,
        )
        px = jnp.floor(pxy[..., 0]).astype(jnp.int32)
        py = jnp.floor(pxy[..., 1]).astype(jnp.int32)
        valid = (
            (z > 0)
            & (pxy[..., 0] >= 0)
            & (pxy[..., 1] >= 0)
            & (px >= 0)
            & (py >= 0)
            & (px < self.width)
            & (py < self.height)
        )
        pix = jnp.stack([jnp.clip(px, 0, self.width - 1),
                         jnp.clip(py, 0, self.height - 1)], axis=-1)
        return pxy, pix, valid

    def with_intrinsics(self, fx, fy, cx, cy) -> "PinholeCamera":
        return PinholeCamera(fx=fx, fy=fy, cx=cx, cy=cy,
                             width=self.width, height=self.height)

    def concrete(self) -> "PinholeCamera":
        """Host camera with python-float intrinsics (e.g. after an
        intrinsics-optimization update produced device scalars)."""
        return PinholeCamera(
            fx=float(self.fx), fy=float(self.fy),
            cx=float(self.cx), cy=float(self.cy),
            width=self.width, height=self.height,
        )


jax.tree_util.register_dataclass(
    PinholeCamera,
    data_fields=("fx", "fy", "cx", "cy"),
    meta_fields=("width", "height"),
)


@dataclasses.dataclass(frozen=True)
class RadTanCamera:
    """Pinhole + radial-tangential (Brown) distortion — the reference's
    RadtanCamera model (libvis camera.h camera hierarchy). SLAM runs on
    undistorted pinhole images; this model exists to describe the SOURCE
    images so the loader can build an undistortion map
    (undistortion.h:40-58)."""

    pinhole: PinholeCamera
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0

    @property
    def width(self) -> int:
        return self.pinhole.width

    @property
    def height(self) -> int:
        return self.pinhole.height

    def distort_normalized(self, nx, ny):
        """Normalized coords -> distorted normalized coords."""
        r2 = nx * nx + ny * ny
        radial = 1.0 + self.k1 * r2 + self.k2 * r2 * r2
        dx = 2.0 * self.p1 * nx * ny + self.p2 * (r2 + 2.0 * nx * nx)
        dy = self.p1 * (r2 + 2.0 * ny * ny) + 2.0 * self.p2 * nx * ny
        return nx * radial + dx, ny * radial + dy

    def project_normalized(self, nx, ny):
        """Normalized coords -> distorted pixel-corner coordinates."""
        xd, yd = self.distort_normalized(nx, ny)
        c = self.pinhole
        return c.fx * xd + c.cx, c.fy * yd + c.cy

    def undistortion_map(self, target: PinholeCamera | None = None):
        """[H, W, 2] source-pixel lookup for each target pixel (host numpy).
        `target` defaults to the distortion-free pinhole core."""
        import numpy as np

        target = target or self.pinhole
        ys, xs = np.mgrid[0:target.height, 0:target.width].astype(np.float32)
        nx = (xs + 0.5 - target.cx) / target.fx
        ny = (ys + 0.5 - target.cy) / target.fy
        px, py = self.project_normalized(nx, ny)
        return np.stack([px, py], axis=-1).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class ThinPrismFisheyeCamera:
    """Pinhole + equidistant-fisheye + radial(k1..k4) + tangential(p1,p2)
    + thin-prism(sx1,sy1) distortion — the reference's 12-parameter
    ThinPrismFisheyeCamera12d (libvis camera.h:726-900). Like RadTanCamera
    this describes SOURCE images; SLAM always runs on the undistorted
    pinhole images produced via `undistortion_map`."""

    pinhole: PinholeCamera
    k1: float = 0.0
    k2: float = 0.0
    k3: float = 0.0
    k4: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    sx1: float = 0.0
    sy1: float = 0.0

    @property
    def width(self) -> int:
        return self.pinhole.width

    @property
    def height(self) -> int:
        return self.pinhole.height

    def distort_normalized(self, nx, ny):
        """Undistorted normalized coords -> distorted normalized coords
        (fisheye theta/r scaling, then polynomial inner part)."""
        import numpy as np

        r = np.sqrt(nx * nx + ny * ny)
        theta_by_r = np.where(r > 1e-6, np.arctan(r) / np.maximum(r, 1e-12),
                              1.0)
        fx_ = theta_by_r * nx
        fy_ = theta_by_r * ny
        x2, y2, xy = fx_ * fx_, fy_ * fy_, fx_ * fy_
        r2 = x2 + y2
        r4 = r2 * r2
        radial = (self.k1 * r2 + self.k2 * r4 + self.k3 * r4 * r2
                  + self.k4 * r4 * r4)
        dx = 2.0 * self.p1 * xy + self.p2 * (r2 + 2.0 * x2) + self.sx1 * r2
        dy = 2.0 * self.p2 * xy + self.p1 * (r2 + 2.0 * y2) + self.sy1 * r2
        return fx_ + radial * fx_ + dx, fy_ + radial * fy_ + dy

    def project_normalized(self, nx, ny):
        """Undistorted normalized coords -> distorted pixel-corner coords."""
        xd, yd = self.distort_normalized(nx, ny)
        c = self.pinhole
        return c.fx * xd + c.cx, c.fy * yd + c.cy

    def undistortion_map(self, target: "PinholeCamera | None" = None):
        """[H, W, 2] source-pixel lookup per target pixel (host numpy)."""
        import numpy as np

        target = target or self.pinhole
        ys, xs = np.mgrid[0:target.height, 0:target.width].astype(np.float32)
        nx = (xs + 0.5 - target.cx) / target.fx
        ny = (ys + 0.5 - target.cy) / target.fy
        px, py = self.project_normalized(nx, ny)
        return np.stack([px, py], axis=-1).astype(np.float32)


def _unproject_normalized(model, px, py, iterations: int = 100):
    """Distorted pixel coords -> undistorted normalized coords by damped
    fixed-point inversion of `distort_normalized` (the reference inverts
    with a per-pixel Gauss-Newton loop, camera.h:646-713; a fixed-point
    scheme converges for the moderate distortions these models describe).
    Host numpy only."""
    import numpy as np

    c = model.pinhole
    xd = (np.asarray(px, np.float64) - c.cx) / c.fx
    yd = (np.asarray(py, np.float64) - c.cy) / c.fy
    nx, ny = xd.copy(), yd.copy()
    for _ in range(iterations):
        gx, gy = model.distort_normalized(nx, ny)
        ex, ey = gx - xd, gy - yd
        nx = nx - 0.7 * ex
        ny = ny - 0.7 * ey
        if max(np.max(np.abs(ex)), np.max(np.abs(ey))) < 1e-10:
            break
    return nx, ny


def decide_undistorted_camera(model, avoid_invalid_pixels: bool = False):
    """Pinhole camera covering a distorted model's field of view
    (DecideForUndistortedCamera, undistortion.cc:33-130; generalized to
    any model with distort_normalized — the reference handles radtan9
    only). With `avoid_invalid_pixels` the pinhole covers only the region
    where every pixel maps inside the source image."""
    import numpy as np

    c = model.pinhole
    w, h = model.width, model.height

    xs = np.arange(w, dtype=np.float64) + 0.5
    ys = np.arange(h, dtype=np.float64) + 0.5
    # Undistorted normalized coords of the four image borders.
    top_x, top_y = _unproject_normalized(model, xs, np.full(w, 0.5))
    bot_x, bot_y = _unproject_normalized(model, xs, np.full(w, h - 0.5))
    lef_x, lef_y = _unproject_normalized(model, np.full(h, 0.5), ys)
    rig_x, rig_y = _unproject_normalized(model, np.full(h, w - 0.5), ys)

    # Project with the pinhole core; sweep borders for the extent.
    def px(nx):
        return c.fx * nx + c.cx

    def py(ny):
        return c.fy * ny + c.cy

    if avoid_invalid_pixels:
        min_x = np.max(px(lef_x))
        max_x = np.min(px(rig_x))
        min_y = np.max(py(top_y))
        max_y = np.min(py(bot_y))
    else:
        min_x = np.min(px(np.concatenate([top_x, bot_x, lef_x, rig_x])))
        max_x = np.max(px(np.concatenate([top_x, bot_x, lef_x, rig_x])))
        min_y = np.min(py(np.concatenate([top_y, bot_y, lef_y, rig_y])))
        max_y = np.max(py(np.concatenate([top_y, bot_y, lef_y, rig_y])))

    new_w = max(1, int(max_x - min_x))
    new_h = max(1, int(max_y - min_y))
    return PinholeCamera(
        fx=c.fx, fy=c.fy,
        cx=c.cx - float(min_x), cy=c.cy - float(min_y),
        width=new_w, height=new_h,
    )


def pixel_grid(height: int, width: int, dtype=jnp.float32):
    """Integer pixel index grids (y, x), each [H, W]."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    return ys, xs


def unproject_map(cam: PinholeCamera, depth: jax.Array) -> jax.Array:
    """Unproject a full depth map [H, W] -> [H, W, 3] camera-frame points."""
    ys, xs = pixel_grid(cam.height, cam.width)
    return cam.unproject(xs.astype(depth.dtype), ys.astype(depth.dtype), depth)
