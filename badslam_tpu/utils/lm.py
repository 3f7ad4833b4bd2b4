"""Generic Levenberg-Marquardt optimizer with optional Schur complement.

Capability analog of libvis's LMOptimizer
(/root/reference/libvis/src/libvis/lm_optimizer.h:47 and
lm_optimizer_impl.h) — the reusable solver libvis ships for tooling and
tests (the badslam core uses its own specialized GN loops, as does this
rebuild). JAX-native: residuals are provided as a function of the state
vector, Jacobians come from jax.jacfwd, and the damped normal equations are
solved densely — or via the Schur complement when the state splits into a
small dense block and a large block-diagonal one (the layout the reference
exploits, lm_optimizer.h "on-the-fly block-diagonal Schur").
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class LMResult(NamedTuple):
    x: jax.Array            # final state
    cost: jax.Array         # final cost
    iterations: jax.Array   # iterations run


def optimize(
    residual_fn: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    max_iterations: int = 50,
    initial_lambda: float = 1e-4,
    lambda_up: float = 10.0,
    lambda_down: float = 0.5,
    tolerance: float = 1e-12,
) -> LMResult:
    """Dense LM: minimize ||residual_fn(x)||^2 over a flat state vector."""

    def cost_of(x):
        r = residual_fn(x)
        return jnp.sum(r * r)

    def step(state):
        x, lam, cost, it, done = state
        r = residual_fn(x)
        J = jax.jacfwd(residual_fn)(x)
        H = J.T @ J
        g = J.T @ r
        n = x.shape[0]

        def try_lambda(lam):
            delta = jnp.linalg.solve(H + lam * jnp.eye(n), -g)
            new_cost = cost_of(x + delta)
            return delta, new_cost

        delta, new_cost = try_lambda(lam)
        improved = new_cost < cost
        x = jnp.where(improved, x + delta, x)
        lam = jnp.where(improved, lam * lambda_down, lam * lambda_up)
        new_cost = jnp.where(improved, new_cost, cost)
        done = (jnp.abs(cost - new_cost) < tolerance * jnp.maximum(cost, 1.0)
                ) & improved
        return x, lam, new_cost, it + 1, done

    def cond(state):
        _, _, _, it, done = state
        return (it < max_iterations) & jnp.logical_not(done)

    x, _, cost, it, _ = jax.lax.while_loop(
        cond, step,
        (x0, jnp.asarray(initial_lambda, x0.dtype), cost_of(x0),
         jnp.int32(0), jnp.bool_(False)),
    )
    return LMResult(x=x, cost=cost, iterations=it)


def optimize_schur(
    residual_fn: Callable[[jax.Array, jax.Array], jax.Array],
    a0: jax.Array,            # [Na] dense block (e.g. a pose)
    b0: jax.Array,            # [Nb, Bb] block-diagonal states (e.g. points)
    max_iterations: int = 50,
    initial_lambda: float = 1e-4,
    lambda_up: float = 10.0,
    lambda_down: float = 0.5,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """LM where each residual row couples the dense block `a` with exactly
    one block-diagonal state b[i] (bundle-adjustment structure):
    `residual_fn(a, b) -> [Nb, R]` with row i depending only on (a, b[i]).

    The update solves the damped normal equations via the Schur complement
    over the b-blocks — the libvis LMOptimizer "Schur complement" mode
    (lm_optimizer.h, used by its SE3 + Schur tests). Returns (a, b, cost).
    """
    nb, bb = b0.shape

    def cost_of(a, b):
        r = residual_fn(a, b)
        return jnp.sum(r * r)

    def step(state):
        a, b, lam, cost, it = state
        r = residual_fn(a, b)                      # [Nb, R]
        Ja = jax.jacfwd(lambda a_: residual_fn(a_, b))(a)   # [Nb, R, Na]
        # d r_i / d b_i only (block-diagonal): vmap a per-row jacobian.
        Jb = jax.vmap(
            lambda bi, i: jax.jacfwd(
                lambda x: residual_fn(a, b.at[i].set(x))[i])(bi)
        )(b, jnp.arange(nb))                        # [Nb, R, Bb]

        U = jnp.einsum("nri,nrj->ij", Ja, Ja)      # [Na, Na]
        W = jnp.einsum("nri,nrj->nij", Ja, Jb)     # [Nb, Na, Bb]
        V = jnp.einsum("nri,nrj->nij", Jb, Jb)     # [Nb, Bb, Bb]
        ga = jnp.einsum("nri,nr->i", Ja, r)
        gb = jnp.einsum("nri,nr->ni", Jb, r)

        na = a.shape[0]
        U = U + lam * jnp.eye(na)
        V = V + lam * jnp.eye(bb)[None]
        V_inv = jnp.linalg.inv(V)
        WVi = jnp.einsum("nij,njk->nik", W, V_inv)          # [Nb, Na, Bb]
        S = U - jnp.einsum("nik,njk->ij", WVi, W)           # Schur
        rhs = -ga + jnp.einsum("nik,nk->i", WVi, gb)
        da = jnp.linalg.solve(S, rhs)
        # Back-substitute each block: db_n = -V_n^{-1} (gb_n + W_n^T da).
        wt_da = jnp.einsum("nji,j->ni", W, da)
        db = -jnp.einsum("nij,nj->ni", V_inv, gb + wt_da)
        new_cost = cost_of(a + da, b + db)
        improved = new_cost < cost
        a = jnp.where(improved, a + da, a)
        b = jnp.where(improved, b + db, b)
        lam = jnp.where(improved, lam * lambda_down, lam * lambda_up)
        return a, b, lam, jnp.where(improved, new_cost, cost), it + 1

    def cond(state):
        *_, it = state
        return it < max_iterations

    a, b, _, cost, _ = jax.lax.while_loop(
        cond, step,
        (a0, b0, jnp.asarray(initial_lambda, a0.dtype), cost_of(a0, b0),
         jnp.int32(0)),
    )
    return a, b, cost
