"""Bound-constrained L-BFGS, jittable and vmappable.

Replaces ``scipy.optimize.minimize(..., method='L-BFGS-B', jac=True)``
(reference: sklearn_gpr.py:587-607) for kernel-hyperparameter optimisation.
The reference deliberately removed the convergence check — "I don't need
convergence, I just need an approximate mean function"
(sklearn_gpr.py:596-599) — so a fixed-iteration projected L-BFGS with
Armijo backtracking is more than sufficient, and unlike scipy it
compiles into the trace program and **vmaps over the 12 restarts**
(sklearn_gpr.py:284-288) instead of looping them on the host.

Bounds are handled by gradient projection: iterates are clipped to the box
and descent directions are zeroed along active constraints.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class LBFGSResult(NamedTuple):
    x: jnp.ndarray       # final iterate (within bounds)
    f: jnp.ndarray       # objective value at x
    n_iters: jnp.ndarray


def _project(x, lb, ub):
    return jnp.clip(x, lb, ub)


def _projected_dir(d, x, g, lb, ub, eps=1e-12):
    # Zero the direction along bound constraints that are active and
    # whose gradient pushes outward.
    at_lo = (x <= lb + eps) & (d < 0)
    at_hi = (x >= ub - eps) & (d > 0)
    return jnp.where(at_lo | at_hi, 0.0, d)


@partial(jax.jit, static_argnames=("fun", "max_iters", "history",
                                   "max_backtracks"))
def minimize_lbfgs_b(fun, x0, lb, ub, max_iters=64, history=8,
                     max_backtracks=20, tol=1e-9):
    """Minimise ``fun`` (returning ``(value, grad)``) within ``[lb, ub]``.

    ``fun`` must be jax-traceable. All shapes are static; the whole solve
    is a ``lax.scan`` so it can be vmapped across restarts.
    """
    d = x0.shape[0]
    x0 = _project(x0, lb, ub)
    f0, g0 = fun(x0)

    S0 = jnp.zeros((history, d), x0.dtype)
    Y0 = jnp.zeros((history, d), x0.dtype)
    rho0 = jnp.zeros((history,), x0.dtype)

    def direction(g, S, Y, rho):
        # Two-loop recursion; invalid pairs (rho == 0) are skipped.
        def bwd(carry, inp):
            q = carry
            s, y, r = inp
            a = r * jnp.dot(s, q)
            q = q - jnp.where(r > 0, a, 0.0) * y
            return q, a
        q, alphas = jax.lax.scan(bwd, g, (S, Y, rho), reverse=True)
        # Initial Hessian scaling from the most recent valid pair.
        sy = jnp.sum(S[-1] * Y[-1])
        yy = jnp.sum(Y[-1] * Y[-1])
        gamma = jnp.where((sy > 0) & (yy > 0), sy / yy, 1.0)
        r_vec = gamma * q

        def fwd(carry, inp):
            r_c = carry
            s, y, r, a = inp
            b = r * jnp.dot(y, r_c)
            r_c = r_c + jnp.where(r > 0, a - b, 0.0) * s
            return r_c, None
        r_vec, _ = jax.lax.scan(fwd, r_vec, (S, Y, rho, alphas))
        return -r_vec

    def body(state, _):
        x, f, g, S, Y, rho, done, it = state

        dvec = direction(g, S, Y, rho)
        dvec = _projected_dir(dvec, x, g, lb, ub)
        gd = jnp.dot(g, dvec)
        # Fall back to projected steepest descent if not a descent dir.
        sd = _projected_dir(-g, x, g, lb, ub)
        use_sd = gd >= 0
        dvec = jnp.where(use_sd, sd, dvec)
        gd = jnp.where(use_sd, jnp.dot(g, sd), gd)

        # Armijo backtracking on the projected path.
        def ls_body(carry, j):
            t_best, f_best, found = carry
            t = (0.5 ** j).astype(x.dtype)
            xt = _project(x + t * dvec, lb, ub)
            ft, _ = fun(xt)
            ft = ft.astype(f.dtype)
            accept = (~found) & (ft <= f + 1e-4 * t * gd) & jnp.isfinite(ft)
            t_best = jnp.where(accept, t, t_best)
            f_best = jnp.where(accept, ft, f_best)
            return (t_best, f_best, found | accept), None
        (t_best, f_new, found), _ = jax.lax.scan(
            ls_body, (jnp.asarray(0.0, x.dtype), f, jnp.asarray(False)),
            jnp.arange(max_backtracks))

        x_new = _project(x + t_best * dvec, lb, ub)
        f_new2, g_new = fun(x_new)

        s = x_new - x
        yv = g_new - g
        sy = jnp.dot(s, yv)
        valid_pair = sy > 1e-10
        S = jnp.where(valid_pair, jnp.roll(S, -1, axis=0).at[-1].set(s), S)
        Y = jnp.where(valid_pair, jnp.roll(Y, -1, axis=0).at[-1].set(yv), Y)
        rho = jnp.where(valid_pair,
                        jnp.roll(rho, -1).at[-1].set(1.0 / sy), rho)

        # Convergence: projected gradient small or no line-search progress.
        pg = x_new - _project(x_new - g_new, lb, ub)
        new_done = done | (~found) | (jnp.max(jnp.abs(pg)) < tol)

        x, f, g = (jnp.where(done, x, x_new), jnp.where(done, f, f_new2),
                   jnp.where(done, g, g_new))
        it = it + jnp.where(done, 0, 1)
        return (x, f, g, S, Y, rho, new_done, it), None

    init = (x0, f0, g0, S0, Y0, rho0, jnp.asarray(False),
            jnp.asarray(0, jnp.int32))
    (x, f, g, S, Y, rho, done, it), _ = jax.lax.scan(
        body, init, None, length=max_iters)
    return LBFGSResult(x=x, f=f, n_iters=it)
