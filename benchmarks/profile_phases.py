"""Perf lab 2: phase-level attribution of iteration + final-fit cost.

Run on the real TPU: ``python -m benchmarks.profile_phases``.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import functools

    import jax
    import jax.numpy as jnp

    import gaussian_process_edge_trace_tpu as gpt
    from gaussian_process_edge_trace_tpu.models import gpr
    from gaussian_process_edge_trace_tpu.models.lbfgs import minimize_lbfgs_b
    from gaussian_process_edge_trace_tpu.trace import kde as kde_mod
    from gaussian_process_edge_trace_tpu.trace import select as sel_mod
    from gaussian_process_edge_trace_tpu.trace.driver import (
        _train_set, finish_trace, init_state, make_config, make_data,
        run_trace, trace_step)
    from gaussian_process_edge_trace_tpu.trace.scoring import (
        best_curves, curve_costs)

    _ = float(jnp.sum(jnp.ones((8,))))
    base = None

    def _fetch_scalar(out):
        # block_until_ready through the tunnel is not reliably a wait
        # (CLAUDE.md measurement gotcha) — force completion by
        # materialising one element of the first output leaf.
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])

    def med(f, *a, k=9):
        _fetch_scalar(f(*a))
        ts = []
        for _ in range(k):
            t0 = time.perf_counter()
            _fetch_scalar(f(*a))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2] * 1e3

    base = med(jax.jit(lambda v: v + 1.0), jnp.ones((8,)), k=21)
    log(f"dispatch baseline: {base:.2f} ms")

    def corr(f, *a, k=9):
        return max(med(f, *a, k=k) - base, 0.0)

    test_img, true_edge = gpt.construct_test_img(
        (500, 500), 200, 4, 0.05, "sinusoidal", 0.3, gaps=True)
    kb = gpt.kernel_builder((11, 5), unit=False)
    grad = np.asarray(gpt.comp_grad_img(test_img, kb), dtype=np.float64)
    init = true_edge[[0, -1]][:, [1, 0]]
    cfg = make_config(init, grad.shape,
                      kernel_options={"kernel": "RBF", "sigma_f": 75,
                                      "length_scale": 20},
                      noise_y=1, N_samples=1000, score_thresh=1, delta_x=5,
                      keep_ratio=0.1, pixel_thresh=5, seed=1,
                      fix_endpoints=True)
    data = make_data(cfg, jnp.asarray(grad), jnp.asarray(init))
    state0 = init_state(cfg)

    t_full = corr(run_trace, cfg, data, state0)
    res = run_trace(cfg, data, state0)
    n_it = int(res.n_iters)
    log(f"full trace: {t_full:.1f} ms, {n_it} iters")

    # converged state
    state = state0
    for _ in range(n_it):
        state, _ = trace_step(cfg, data, state)
    state = jax.block_until_ready(state)
    t_fin = corr(lambda: finish_trace(cfg, data, state))
    log(f"final fit (finish_trace): {t_fin:.2f} ms "
        f"-> iterations total ~{t_full - t_fin:.1f} "
        f"({(t_full - t_fin) / n_it:.2f} ms/iter in-program)")

    # --- iteration phases (standalone, dispatch-corrected) ------------------
    x, y, mask, noise_w = jax.block_until_ready(
        jax.jit(lambda s: _train_set(cfg, data, s))(state))
    key = jax.random.PRNGKey(0)

    from gaussian_process_edge_trace_tpu.trace.driver import _sample_round

    samp = jax.jit(lambda k: _sample_round(cfg, data, x, y, mask,
                                           noise_w, k))
    log(f"  sample_round:   {corr(samp, key):7.3f} ms")
    samples = jax.block_until_ready(samp(key))

    cc = jax.jit(lambda s: curve_costs(data.grad_img, data.x_grid, s,
                                       kde_thresh=cfg.kde_thresh))
    log(f"  curve_costs:    {corr(cc, samples):7.3f} ms")
    costs = jax.block_until_ready(cc(samples))

    bc_f = jax.jit(lambda s, c: best_curves(s, c, cfg.N_keep))
    log(f"  best_curves:    {corr(bc_f, samples, costs):7.3f} ms")
    bc, bcosts = jax.block_until_ready(bc_f(samples, costs))

    kde_f = jax.jit(lambda b, w: kde_mod.curve_kde(b, w, cfg.M, cfg.N,
                                                   cfg.x_st))
    w = 1.0 / bcosts
    log(f"  curve_kde:      {corr(kde_f, bc, w):7.3f} ms")
    kde_arr = jax.block_until_ready(kde_f(bc, w))

    sel_f = jax.jit(functools.partial(
        sel_mod.select_pixels, spec=cfg.bins,
        fix_endpoints=cfg.fix_endpoints, kde_thresh=cfg.kde_thresh,
        pixel_thresh=cfg.pixel_thresh, algo_thresh=cfg.algo_thresh,
        max_decays=cfg.max_decays))
    prev_x = jnp.concatenate([state.user_x, state.obs_x])
    prev_y = jnp.concatenate([state.user_y, state.obs_y])
    prev_v = jnp.concatenate([state.user_valid, state.obs_valid])
    log(f"  select_pixels:  "
        f"{corr(lambda: sel_f(kde_arr, data.grad_kde, prev_x, prev_y, prev_v, state.n_fobs, state.score_thresh)):7.3f} ms")

    # --- GP primitives -------------------------------------------------------
    n = cfg.n_train
    K = jax.block_until_ready(jax.jit(
        lambda: gpr.train_gram(cfg.kernel, x.astype(jnp.float32),
                               cfg.sigma_l, 100.0,
                               noise_w + 1e-6, mask=mask))())
    log(f"  train_gram {n}: {corr(jax.jit(lambda: gpr.train_gram(cfg.kernel, x.astype(jnp.float32), cfg.sigma_l, 100.0, noise_w + 1e-6, mask=mask))):7.3f} ms")
    log(f"  safe_cholesky {n}x{n}x3: "
        f"{corr(jax.jit(gpr.safe_cholesky), K):7.3f} ms")
    L = jax.block_until_ready(jax.jit(gpr.safe_cholesky)(K))
    rhs = jnp.ones((n, cfg.N_samples), jnp.float32)
    from jax.scipy.linalg import cho_solve
    log(f"  cho_solve (n,S): "
        f"{corr(jax.jit(lambda L, r: cho_solve((L, True), r)), L, rhs):7.3f} ms")

    # --- final-fit decomposition --------------------------------------------
    from gaussian_process_edge_trace_tpu.models.gpr import (
        log_marginal_likelihood, masked_mean, masked_std)
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    X_m, X_s = masked_mean(xf, mask), masked_std(xf, mask)
    y_m, y_s = masked_mean(yf, mask), masked_std(yf, mask)
    xs = jnp.where(mask, (xf - X_m) / X_s, 0.0)
    ys_ = jnp.where(mask, (yf - y_m) / y_s, 0.0)

    def neg_lml(theta):
        return -log_marginal_likelihood(cfg.kernel, xs, ys_, mask, theta,
                                        noise_w, jitter=cfg.gp_jitter)

    obj = jax.value_and_grad(neg_lml)
    lb = jnp.log(jnp.asarray([0.01, 0.1, 1e-18], jnp.float32))
    ub = jnp.log(jnp.asarray([1e3, 100.0, 1.0], jnp.float32))
    key2 = jax.random.PRNGKey(1)
    starts = jnp.concatenate(
        [jnp.log(jnp.asarray([[5.0, 5.0, 1.0]], jnp.float32)),
         jax.random.uniform(key2, (12, 3)) * (ub - lb) + lb])

    screen = jax.jit(lambda st: jax.vmap(lambda t: obj(t)[0])(st))
    log(f"  screen 13 starts (value only): {corr(screen, starts):7.3f} ms")
    vg4 = jax.jit(lambda st: jax.vmap(obj)(st))
    log(f"  batched value_and_grad x4:     {corr(vg4, starts[:4]):7.3f} ms")

    for mi in (1, 2, 4, 8):
        solve = jax.jit(lambda st, m=mi: jax.vmap(
            lambda t: minimize_lbfgs_b(obj, t, lb=lb, ub=ub, max_iters=m,
                                       tol=1e-5).f)(st))
        log(f"  lbfgs x4, max_iters={mi}: {corr(solve, starts[:4]):7.3f} ms")


if __name__ == "__main__":
    main()
