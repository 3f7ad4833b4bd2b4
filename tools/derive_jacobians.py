#!/usr/bin/env python
"""Symbolic derivation + verification of the residual Jacobians.

Analog of the reference's offline sympy tooling
(applications/badslam/scripts/jacobians_derivation.py): derives the depth
(point-to-plane) residual's Jacobians w.r.t. the 6-dof pose twist, the
surfel's 1-D position offset, and the intrinsics/deformation parameters,
and checks them against the closed forms implemented in
badslam_tpu/ba/{pose_opt,pcg,intrinsics_opt}.py. Run:

    python tools/derive_jacobians.py
"""

import sympy as sp


def main():
    # Symbols: surfel local position p, local normal n (unit), measured
    # unprojection u (depth * (nx, ny, 1)), inverse stddev s.
    px, py, pz = sp.symbols("px py pz")
    nx, ny, nz = sp.symbols("nx ny nz")
    ux, uy, uz = sp.symbols("ux uy uz")
    s = sp.Symbol("s")
    p = sp.Matrix([px, py, pz])
    n = sp.Matrix([nx, ny, nz])
    u = sp.Matrix([ux, uy, uz])

    # Pose right-perturbation xi = (v, w): p(xi) = exp(-xi) p ~= p - v - w x p
    v = sp.Matrix(sp.symbols("v0 v1 v2"))
    w = sp.Matrix(sp.symbols("w0 w1 w2"))
    p_pert = p - v - w.cross(p)
    r = s * n.dot(u - p_pert)

    J_v = [sp.simplify(sp.diff(r, vi)) for vi in v]
    J_w = [sp.simplify(sp.diff(r, wi)) for wi in w]
    print("d r / d v =", J_v, " (expect s*n)")
    assert J_v == [s * nx, s * ny, s * nz]
    # Exact rotation rows: s * (p x n)  (used by the PCG solver).
    expect_w = (p.cross(n) * s)
    for a, b in zip(J_w, expect_w):
        assert sp.simplify(a - b) == 0
    print("d r / d w =", J_w, " (= s * (p x n)) OK")
    print("NOTE: pose_opt/tracking use the reference's local-frame "
          "simplification (u in place of p in the rotation rows, "
          "kernel_opt_pose.cu:85-93); pcg.py uses the exact form above.")

    # Surfel 1-D offset along its normal: p(delta) = p + delta * n.
    delta = sp.Symbol("delta")
    r_geo = s * n.dot(u - (p + delta * n))
    J_delta = sp.simplify(sp.diff(r_geo, delta).subs(
        nx**2 + ny**2 + nz**2, 1))
    print("d r / d delta =", J_delta, " (expect -s for unit n)")
    assert J_delta == -s

    # Depth deformation: d_cal = 1 / (1/d_raw + c * exp(-a / d_raw)).
    d_raw, c, a = sp.symbols("d_raw c a", positive=True)
    inv = 1 / d_raw
    e = sp.exp(-a * inv)
    d_cal = 1 / (inv + c * e)
    # r = s * dot * d_cal + const; jac_base = s * dot * e / ci^2 in the code.
    dot = sp.Symbol("dot")
    r_i = s * dot * d_cal
    ci = inv + c * e
    dd_dc = sp.simplify(sp.diff(r_i, c))
    dd_da = sp.simplify(sp.diff(r_i, a))
    jac_base = s * dot * e / ci**2
    assert sp.simplify(dd_dc + jac_base) == 0          # d r/d c = -jac_base
    assert sp.simplify(dd_da - jac_base * c * inv) == 0  # = +jac_base*c/d
    print("d r / d cfactor = -jac_base; d r / d a = +jac_base*c/d_raw OK")
    print("All symbolic Jacobians match the implementations.")


if __name__ == "__main__":
    main()
