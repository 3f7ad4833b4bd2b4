#!/usr/bin/env python
"""Absolute trajectory error evaluation for TUM-format trajectories.

The measurement harness for BASELINE.md's "ATE within 5% of CUDA BAD SLAM
on ETH3D": associate an estimated trajectory with ground truth by
timestamp, align (SE3 by default, Sim3 with --align sim3, none with
--align none), and report ATE RMSE plus per-axis stats — the TUM benchmark
evaluate_ate protocol the reference's README points users at. Works on any
TUM/ETH3D-format dataset the moment one is mounted:

    python tools/evaluate_ate.py est.txt groundtruth.txt [--align sim3]

Also usable as a library: `associate_and_evaluate(est_path, gt_path)`.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..")]


def load_trajectory_host(path: str):
    """TUM file -> (timestamps [N], positions [N,3], quats wxyz [N,4]).
    Pure numpy (no jax import): usable in scripts without device setup."""
    ts, pos, quat = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.replace(",", " ").split()]
            ts.append(v[0])
            pos.append(v[1:4])
            qx, qy, qz, qw = v[4:8]
            quat.append([qw, qx, qy, qz])
    return np.array(ts), np.array(pos), np.array(quat)


def associate(ts_a, ts_b, max_difference: float = 0.02):
    """Nearest-timestamp association (TUM associate.py protocol):
    returns index pairs (i, j) with |ts_a[i] - ts_b[j]| <= max_difference,
    each trajectory entry used at most once, greedily by time difference."""
    cand = []
    for i, t in enumerate(ts_a):
        j = int(np.argmin(np.abs(ts_b - t)))
        d = abs(ts_b[j] - t)
        if d <= max_difference:
            cand.append((d, i, j))
    cand.sort()
    used_a, used_b, pairs = set(), set(), []
    for d, i, j in cand:
        if i in used_a or j in used_b:
            continue
        used_a.add(i)
        used_b.add(j)
        pairs.append((i, j))
    pairs.sort()
    return pairs


def evaluate(est_pos: np.ndarray, gt_pos: np.ndarray, align: str = "se3"):
    """Returns dict of ATE stats after alignment (Horn / Umeyama)."""
    from badslam_tpu.synthetic import ate_rmse

    class _P:  # ate_rmse takes pose-likes with .t
        def __init__(self, t):
            self.t = t

    rmse = ate_rmse([_P(p) for p in est_pos], [_P(p) for p in gt_pos],
                    align=align)
    # Per-pair distances after the same alignment, for mean/median/max.
    mu_e, mu_g = est_pos.mean(0), gt_pos.mean(0)
    E, G = est_pos - mu_e, gt_pos - mu_g
    U, sv, Vt = np.linalg.svd(E.T @ G)
    sign = np.sign(np.linalg.det(U @ Vt))
    S = np.diag([1.0, 1.0, sign])
    R = (U @ S @ Vt).T
    scale = (float(np.sum(sv * np.diag(S)) / max(np.sum(E * E), 1e-30))
             if align == "sim3" else 1.0)
    if align == "none":
        aligned = est_pos
    else:
        aligned = scale * (est_pos @ R.T) + (mu_g - scale * (R @ mu_e))
    err = np.linalg.norm(aligned - gt_pos, axis=-1)
    return {
        "rmse": rmse,
        "mean": float(err.mean()),
        "median": float(np.median(err)),
        "max": float(err.max()),
        "pairs": len(est_pos),
        "scale": scale,
    }


def associate_and_evaluate(est_path: str, gt_path: str, align: str = "se3",
                           max_difference: float = 0.02):
    ts_e, pos_e, _ = load_trajectory_host(est_path)
    ts_g, pos_g, _ = load_trajectory_host(gt_path)
    pairs = associate(ts_e, ts_g, max_difference)
    if not pairs:
        raise ValueError("no timestamp associations found")
    ei = [i for i, _ in pairs]
    gj = [j for _, j in pairs]
    return evaluate(pos_e[ei], pos_g[gj], align)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("estimated", help="estimated trajectory (TUM format)")
    p.add_argument("groundtruth", help="ground-truth trajectory (TUM format)")
    p.add_argument("--align", choices=("se3", "sim3", "none"), default="se3")
    p.add_argument("--max_difference", type=float, default=0.02,
                   help="max timestamp difference for association [s]")
    args = p.parse_args(argv)
    stats = associate_and_evaluate(args.estimated, args.groundtruth,
                                   args.align, args.max_difference)
    print(f"pairs:        {stats['pairs']}")
    print(f"ate rmse [m]: {stats['rmse']:.6f}")
    print(f"mean [m]:     {stats['mean']:.6f}")
    print(f"median [m]:   {stats['median']:.6f}")
    print(f"max [m]:      {stats['max']:.6f}")
    if args.align == "sim3":
        print(f"scale:        {stats['scale']:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
