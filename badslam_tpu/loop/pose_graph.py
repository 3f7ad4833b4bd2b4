"""SE3 pose-graph optimization (host, numpy Gauss-Newton).

Rebuild of the reference's thin g2o wrapper
(/root/reference/applications/badslam/src/badslam/pose_graph_optimizer.cc:69-131):
VertexSE3 per keyframe, an odometry EdgeSE3 chain from the current
estimates plus the loop-closure edges, identity information matrices,
vertex 0 fixed, Gauss-Newton (reference: 20 iterations, CSparse).

The graph is small (hundreds of keyframes), so a dense 6Kx6K Cholesky on
the host is the right tool — no device involvement at all (the reference
likewise runs g2o on the CPU).

Edge residual: r = log( Z^{-1} * Xi^{-1} * Xj )  for measurement Z =
Xi^{-1} Xj (relative pose i->j), with Jacobians approximated at identity
increment (Gauss-Newton with right-multiplied local updates X <- X*exp(d)).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from badslam_tpu.geometry import se3_np as s3


class PoseGraphEdge:
    __slots__ = ("i", "j", "measurement", "weight")

    def __init__(self, i: int, j: int, measurement: s3.SE3,
                 weight: float = 1.0):
        self.i = i
        self.j = j
        self.measurement = measurement  # j_T_i... stored as i->j: Xi^-1 Xj
        self.weight = weight


def _adjoint(p: s3.SE3) -> np.ndarray:
    """SE3 adjoint [[R, [t]x R], [0, R]] for twist order [v, w]."""
    R = s3.quat_to_matrix(p.q)
    t = np.asarray(p.t, float)
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    A = np.zeros((6, 6))
    A[:3, :3] = R
    A[:3, 3:] = tx @ R
    A[3:, 3:] = R
    return A


def optimize_pose_graph(
    poses: List[s3.SE3],
    edges: Sequence[PoseGraphEdge],
    fixed: int = 0,
    iterations: int = 20,
    damping: float = 1e-6,
) -> List[s3.SE3]:
    """Gauss-Newton over global_T_frame vertices; returns updated poses."""
    n = len(poses)
    poses = list(poses)
    if n == 0:
        return poses

    for _ in range(iterations):
        H = np.zeros((6 * n, 6 * n))
        b = np.zeros(6 * n)
        total_err = 0.0
        for e in edges:
            xi, xj = poses[e.i], poses[e.j]
            # r = log(Z^-1 Xi^-1 Xj)
            rel = s3.mul(s3.inverse(xi), xj)
            err_pose = s3.mul(s3.inverse(e.measurement), rel)
            r = s3.log(err_pose)
            total_err += float(r @ r)
            # d r / d dj ≈ I (right-perturbation of Xj), d r / d di ≈ -Adj(rel^-1)
            Jj = np.eye(6)
            Ji = -_adjoint(s3.inverse(rel))
            w = e.weight
            for (a, Ja) in ((e.i, Ji), (e.j, Jj)):
                for (c, Jc) in ((e.i, Ji), (e.j, Jj)):
                    H[6 * a:6 * a + 6, 6 * c:6 * c + 6] += w * Ja.T @ Jc
                b[6 * a:6 * a + 6] += w * Ja.T @ r
        # Gauge fix.
        H[6 * fixed:6 * fixed + 6, :] = 0
        H[:, 6 * fixed:6 * fixed + 6] = 0
        H[6 * fixed:6 * fixed + 6, 6 * fixed:6 * fixed + 6] = np.eye(6)
        b[6 * fixed:6 * fixed + 6] = 0
        H[np.diag_indices_from(H)] += damping

        try:
            delta = np.linalg.solve(H, -b)
        except np.linalg.LinAlgError:
            break
        if not np.all(np.isfinite(delta)):
            break
        for v in range(n):
            poses[v] = s3.mul(poses[v], s3.exp(delta[6 * v:6 * v + 6]))
        if np.linalg.norm(delta) < 1e-10:
            break
    return poses


def odometry_chain_edges(poses: List[s3.SE3]) -> List[PoseGraphEdge]:
    """EdgeSE3 chain from the current estimates
    (pose_graph_optimizer.cc:84-103)."""
    edges = []
    for i in range(len(poses) - 1):
        z = s3.mul(s3.inverse(poses[i]), poses[i + 1])
        edges.append(PoseGraphEdge(i, i + 1, z))
    return edges
