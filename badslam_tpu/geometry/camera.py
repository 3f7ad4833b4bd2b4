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


def pixel_grid(height: int, width: int, dtype=jnp.float32):
    """Integer pixel index grids (y, x), each [H, W]."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    return ys, xs


def unproject_map(cam: PinholeCamera, depth: jax.Array) -> jax.Array:
    """Unproject a full depth map [H, W] -> [H, W, 3] camera-frame points."""
    ys, xs = pixel_grid(cam.height, cam.width)
    return cam.unproject(xs.astype(depth.dtype), ys.astype(depth.dtype), depth)
