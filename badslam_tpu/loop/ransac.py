"""3D-3D point-cloud alignment RANSAC (host, numpy).

Replaces the reference's OpenGV point_cloud::RansacPointCloud usage
(/root/reference/applications/badslam/src/badslam/loop_detector.cc:299-360):
sample 3 correspondences, solve the closed-form rigid alignment (Horn /
Umeyama without scale), count inliers by 3D distance, refine on the inlier
set.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from badslam_tpu.geometry import se3_np as s3


def rigid_align(a: np.ndarray, b: np.ndarray) -> s3.SE3:
    """Least-squares SE3 with b ≈ R a + t (Horn's method)."""
    mu_a = a.mean(axis=0)
    mu_b = b.mean(axis=0)
    U, _, Vt = np.linalg.svd((a - mu_a).T @ (b - mu_b))
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R = Vt.T @ S @ U.T
    t = mu_b - R @ mu_a
    return s3.SE3(s3.matrix_to_quat(R), t)


def ransac_point_cloud_alignment(
    a: np.ndarray,                 # [N, 3] points in frame A
    b: np.ndarray,                 # [N, 3] corresponding points in frame B
    threshold: float = 0.05,       # inlier distance (m)
    max_iterations: int = 200,
    min_inliers: int = 10,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[Optional[s3.SE3], np.ndarray]:
    """Returns (B_T_A or None, inlier mask)."""
    n = a.shape[0]
    if n < 3:
        return None, np.zeros(n, bool)
    rng = rng or np.random.default_rng(0)

    best_inliers = np.zeros(n, bool)
    best_count = 0
    for _ in range(max_iterations):
        idx = rng.choice(n, 3, replace=False)
        sa, sb = a[idx], b[idx]
        # Degenerate (near-collinear) samples give unstable alignments.
        if np.linalg.norm(np.cross(sa[1] - sa[0], sa[2] - sa[0])) < 1e-8:
            continue
        pose = rigid_align(sa, sb)
        pred = s3.transform_points(pose, a)
        inliers = np.linalg.norm(pred - b, axis=-1) < threshold
        c = int(inliers.sum())
        if c > best_count:
            best_count = c
            best_inliers = inliers
            if c > 0.8 * n:
                break

    if best_count < max(3, min_inliers):
        return None, best_inliers
    pose = rigid_align(a[best_inliers], b[best_inliers])
    pred = s3.transform_points(pose, a)
    inliers = np.linalg.norm(pred - b, axis=-1) < threshold
    if int(inliers.sum()) >= 3:
        pose = rigid_align(a[inliers], b[inliers])
    return pose, inliers
