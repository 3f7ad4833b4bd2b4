"""SE3 pose-graph optimization (host, numpy Gauss-Newton).

Rebuild of the reference's thin g2o wrapper
(/root/reference/applications/badslam/src/badslam/pose_graph_optimizer.cc:69-131):
VertexSE3 per keyframe, an odometry EdgeSE3 chain from the current
estimates plus the loop-closure edges, identity information matrices,
vertex 0 fixed, Gauss-Newton (reference: 20 iterations, CSparse).

Like the reference's CSparse backend (pose_graph_optimizer.cc:104-110),
the normal equations are assembled as a SPARSE block system — the graph is
a chain plus a few loop edges, so H has O(K) nonzero 6x6 blocks — and
solved with scipy's sparse LU after eliminating the fixed vertex (gauge).
No device involvement at all (the reference likewise runs g2o on the CPU).

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

    import scipy.sparse as sp
    from scipy.sparse.linalg import spsolve

    # Variable layout: the fixed vertex is eliminated from the system
    # (delta_fixed = 0), the remaining vertices pack densely.
    var = np.full(n, -1, np.int64)
    var[np.arange(n) != fixed] = np.arange(n - 1)
    m = 6 * (n - 1)
    if m == 0:
        return poses
    # Index template for scattering one 6x6 block into COO arrays.
    br, bc = np.mgrid[0:6, 0:6]

    for _ in range(iterations):
        rows: List[np.ndarray] = []
        cols: List[np.ndarray] = []
        data: List[np.ndarray] = []
        b = np.zeros(m)
        for e in edges:
            xi, xj = poses[e.i], poses[e.j]
            # r = log(Z^-1 Xi^-1 Xj)
            rel = s3.mul(s3.inverse(xi), xj)
            err_pose = s3.mul(s3.inverse(e.measurement), rel)
            r = s3.log(err_pose)
            # d r / d dj ≈ I (right-perturbation of Xj), d r / d di ≈ -Adj(rel^-1)
            Jj = np.eye(6)
            Ji = -_adjoint(s3.inverse(rel))
            w = e.weight
            for (a, Ja) in ((e.i, Ji), (e.j, Jj)):
                if var[a] < 0:
                    continue
                for (c, Jc) in ((e.i, Ji), (e.j, Jj)):
                    if var[c] < 0:
                        continue
                    rows.append(6 * var[a] + br.ravel())
                    cols.append(6 * var[c] + bc.ravel())
                    data.append((w * Ja.T @ Jc).ravel())
                b[6 * var[a]:6 * var[a] + 6] += w * Ja.T @ r
        if not rows:
            break
        H = sp.coo_matrix(
            (np.concatenate(data),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=(m, m),
        ).tocsc() + damping * sp.eye(m, format="csc")

        try:
            delta = spsolve(H, -b)
        except RuntimeError:
            break
        if not np.all(np.isfinite(delta)):
            break
        for v in range(n):
            if var[v] >= 0:
                poses[v] = s3.mul(
                    poses[v], s3.exp(delta[6 * var[v]:6 * var[v] + 6]))
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
