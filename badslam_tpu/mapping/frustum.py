"""Camera frustum intersection for keyframe covisibility.

Capability analog of libvis ``CameraFrustum``
(/root/reference/libvis/src/libvis/camera_frustum.h:1-225): a keyframe's
view volume is the convex hull of the 4 image-corner rays between its min
and max observed depth; two keyframes are covisible if their volumes
intersect. Implemented as a separating-axis test over both hulls' face
normals (slightly conservative: skipping edge-cross axes can only report
extra intersections, which only adds covisibility edges — harmless).

Pure NumPy: this is host-side control-flow input, not device compute.
"""

from __future__ import annotations

import numpy as np

from badslam_tpu.geometry.camera import PinholeCamera


class Frustum:
    def __init__(
        self,
        cam: PinholeCamera,
        min_depth: float,
        max_depth: float,
        world_R_frame: np.ndarray,  # [3, 3]
        world_t_frame: np.ndarray,  # [3]
    ):
        # Corner directions through the image corners (corner convention).
        xs = np.array([0.0, cam.width, cam.width, 0.0])
        ys = np.array([0.0, 0.0, cam.height, cam.height])
        dirs = np.stack(
            [(xs - cam.cx) / cam.fx, (ys - cam.cy) / cam.fy, np.ones(4)], axis=-1
        )
        near = dirs * min_depth
        far = dirs * max_depth
        pts_local = np.concatenate([near, far], axis=0)  # [8, 3]
        self.points = pts_local @ world_R_frame.T + world_t_frame

        # Face normals (world frame): viewing axis (near/far planes) + 4 sides.
        axis = world_R_frame[:, 2]
        normals = [axis]
        for i in range(4):
            d0 = dirs[i]
            d1 = dirs[(i + 1) % 4]
            n = np.cross(d0, d1)
            normals.append(world_R_frame @ n)
        self.face_normals = np.stack(normals, axis=0)

    def intersects(self, other: "Frustum") -> bool:
        for axes in (self.face_normals, other.face_normals):
            for n in axes:
                a = self.points @ n
                b = other.points @ n
                if a.max() < b.min() or b.max() < a.min():
                    return False
        return True
