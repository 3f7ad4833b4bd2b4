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


# ---------------------------------------------------------------------------
# Device pose graph (read-free loop closure)
#
# On the axon TPU runtime a single device->host value read permanently
# degrades the session ~1000x (PERF_NOTES.md), so the host g2o-style solver
# above cannot be fed device keyframe poses during a live run. This jitted
# version runs the same chain+loop-edge Gauss-Newton entirely ON DEVICE:
# dense 6n x 6n normal equations (n <= a few hundred keyframes — trivially
# small for the MXU), vertex 0 held by a strong prior, loop-edge weight 0
# turning the whole solve into an exact no-op (chain residuals are zero by
# construction, so b = 0 and the damped solve returns delta = 0).
# ---------------------------------------------------------------------------


def _adjoint_dev(q, t):
    """Batched SE3 adjoint [[R, [t]x R], [0, R]] (twist order [v, w])."""
    import jax.numpy as jnp

    from badslam_tpu.geometry import se3

    R = se3.quat_to_matrix(q)                       # [..., 3, 3]
    zeros = jnp.zeros_like(t[..., 0])
    tx = jnp.stack([
        jnp.stack([zeros, -t[..., 2], t[..., 1]], -1),
        jnp.stack([t[..., 2], zeros, -t[..., 0]], -1),
        jnp.stack([-t[..., 1], t[..., 0], zeros], -1),
    ], -2)
    top = jnp.concatenate([R, tx @ R], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)     # [..., 6, 6]


def optimize_pose_graph_device(
    q,            # [n, 4] temporally-ordered keyframe rotations
    t,            # [n, 3]
    n_live,       # [] i32: valid prefix length (padded rows inert)
    loop_a,       # [] i32: loop edge source vertex (matched position)
    loop_b,       # [] i32: loop edge target vertex (current position)
    loop_zq,      # [4] measurement Z = X_a^-1 X_b (matched_T_cur)
    loop_zt,      # [3]
    loop_weight,  # [] f32: 0 disables the closure (exact no-op)
    iterations: int = 20,
):
    """Traced chain+loop pose-graph GN; returns (q, t) optimized.

    Chain measurements are taken from the INPUT poses (the reference's
    odometry chain from current estimates, pose_graph_optimizer.cc:84-103),
    so only the loop edge carries residual."""
    import jax
    import jax.numpy as jnp

    from badslam_tpu.geometry import se3

    n = q.shape[0]
    X0 = se3.SE3(q, t)
    # Chain measurements Z_i = X_i^-1 X_{i+1} from the input estimates.
    chain_z = se3.mul(se3.inverse(se3.SE3(q[:-1], t[:-1])),
                      se3.SE3(q[1:], t[1:]))
    ia = jnp.concatenate([jnp.arange(n - 1, dtype=jnp.int32),
                          jnp.asarray(loop_a, jnp.int32)[None]])
    ib = jnp.concatenate([jnp.arange(1, n, dtype=jnp.int32),
                          jnp.asarray(loop_b, jnp.int32)[None]])
    zq = jnp.concatenate([chain_z.q, jnp.asarray(loop_zq)[None]])
    zt = jnp.concatenate([chain_z.t, jnp.asarray(loop_zt)[None]])
    w = jnp.concatenate([
        (jnp.arange(n - 1) < n_live - 1).astype(jnp.float32),
        jnp.asarray(loop_weight, jnp.float32)[None],
    ])

    def gn_step(_, qt):
        cq, ct = qt
        Xa = se3.SE3(cq[ia], ct[ia])
        Xb = se3.SE3(cq[ib], ct[ib])
        rel = se3.mul(se3.inverse(Xa), Xb)
        err = se3.mul(se3.inverse(se3.SE3(zq, zt)), rel)
        r = jax.vmap(se3.log)(err)                       # [E, 6]
        inv_rel = se3.inverse(rel)
        Ji = -_adjoint_dev(inv_rel.q, inv_rel.t)         # [E, 6, 6]
        Jj = jnp.broadcast_to(jnp.eye(6), Ji.shape)

        H = jnp.zeros((n, n, 6, 6), jnp.float32)
        bv = jnp.zeros((n, 6), jnp.float32)
        we = w[:, None, None]
        JiT = jnp.swapaxes(Ji, -1, -2)
        H = H.at[ia, ia].add(we * JiT @ Ji)
        H = H.at[ia, ib].add(we * JiT @ Jj)
        H = H.at[ib, ia].add(we * jnp.swapaxes(Jj, -1, -2) @ Ji)
        H = H.at[ib, ib].add(we * jnp.swapaxes(Jj, -1, -2) @ Jj)
        bv = bv.at[ia].add(w[:, None] * jnp.einsum("eij,ej->ei", JiT, r))
        bv = bv.at[ib].add(w[:, None] * r)
        # Gauge prior on vertex 0 + LM damping (padded vertices have b = 0,
        # so damping pins their deltas at exactly zero).
        H = H.at[0, 0].add(1e4 * jnp.eye(6))
        Hd = (H.transpose(0, 2, 1, 3).reshape(6 * n, 6 * n)
              + 1e-5 * jnp.eye(6 * n))
        delta = jnp.linalg.solve(Hd, -bv.reshape(-1)).reshape(n, 6)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        upd = jax.vmap(lambda p_q, p_t, d: se3.mul(
            se3.SE3(p_q, p_t), se3.exp(d)))(cq, ct, delta)
        return upd.q, upd.t

    q_out, t_out = jax.lax.fori_loop(0, iterations, gn_step, (q, t))
    return q_out, t_out


def odometry_chain_edges(poses: List[s3.SE3]) -> List[PoseGraphEdge]:
    """EdgeSE3 chain from the current estimates
    (pose_graph_optimizer.cc:84-103)."""
    edges = []
    for i in range(len(poses) - 1):
        z = s3.mul(s3.inverse(poses[i]), poses[i + 1])
        edges.append(PoseGraphEdge(i, i + 1, z))
    return edges
