"""``GP_Edge_Tracing`` — the reference-compatible user API.

Same constructor signature, defaults, clamping semantics, and return
conventions as the reference class (gpet.py:22-35, 768-908), wrapping the
fused XLA trace program in :mod:`..trace.driver`.

Two execution paths:

- **fused** (default): the whole trace — every GP round, sampling, KDE,
  selection, and the final LML-optimised fit — runs as one compiled XLA
  program (`run_trace`). This is the production/TPU path.
- **introspective**: when per-iteration output is requested
  (``show_post_iter``, ``return_lines``, or ``verbose``) the same jitted
  iteration body is driven from a Python loop so samples and observations
  can be plotted/collected each round (gpet.py:829-870) — identical
  numerics, one host sync per iteration.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_process_edge_trace_tpu.trace.driver import (
    finish_trace, init_state, make_config, make_data, preview_samples,
    run_trace, trace_step)


class GP_Edge_Tracing:
    """Trace one edge in one gradient image via GP regression.

    Positional signature mirrors gpet.py:22-35 exactly:
    ``(init, grad_img, kernel_options, noise_y, obs, N_samples,
    score_thresh, delta_x, keep_ratio, pixel_thresh, seed, return_std,
    fix_endpoints)``. Keyword-first construction is also supported, plus
    TPU-specific extras (``max_iters``) as keyword-only arguments.
    """

    def __init__(self, init, grad_img, kernel_options=(1, 3, 3), noise_y=1,
                 obs=np.array([], dtype=np.int8), N_samples=500,
                 score_thresh=1, delta_x=20, keep_ratio=0.1, pixel_thresh=5,
                 seed=42, return_std=False, fix_endpoints=True, *,
                 max_iters=48):
        init = np.asarray(init)
        self.init = init[np.argsort(init[:, 0])].astype(int)  # gpet.py:95
        self.obs = np.asarray(obs).reshape(-1, 2).astype(np.int64)
        self.return_std = bool(return_std)

        grad_img = np.asarray(grad_img)
        self.cfg = make_config(
            init, grad_img.shape, kernel_options=kernel_options,
            noise_y=noise_y, n_user_obs=self.obs.shape[0],
            N_samples=N_samples, score_thresh=score_thresh, delta_x=delta_x,
            keep_ratio=keep_ratio, pixel_thresh=pixel_thresh, seed=seed,
            fix_endpoints=fix_endpoints, max_iters=max_iters)
        self.data = make_data(self.cfg, jnp.asarray(grad_img),
                              jnp.asarray(self.init))
        # Mirror the reference's public attributes (gpet.py:95-119).
        cfg = self.cfg
        self.x_st, self.x_en = cfg.x_st, cfg.x_en
        self.M, self.N = cfg.M, cfg.N
        self.edge_length = cfg.edge_length
        self.N_samples = cfg.N_samples
        self.N_subints = cfg.N_subints
        self.N_keep = cfg.N_keep
        self.algo_thresh = cfg.algo_thresh
        self.delta_x = cfg.delta_x
        self.keep_ratio = (float(keep_ratio) if 0 < keep_ratio <= 1 else 0.1)
        self.pixel_thresh = cfg.pixel_thresh
        self.score_thresh = cfg.score_thresh0
        self.kde_thresh = cfg.kde_thresh
        self.seed = cfg.seed
        self.fix_endpoints = cfg.fix_endpoints
        self.noise_y = cfg.noise_y
        self.sigma_f, self.sigma_l = cfg.sigma_f, cfg.sigma_l
        self.x_grid = np.asarray(self.data.x_grid)
        self.grad_img = np.asarray(self.data.grad_img)
        self.grad_kde = np.asarray(self.data.grad_kde)

    # -- helpers ----------------------------------------------------------

    def _obs_list(self, state):
        """Valid observations of ``state`` as an (n, 2) xy array."""
        xs = np.concatenate([np.asarray(state.user_x),
                             np.asarray(state.obs_x)])
        ys = np.concatenate([np.asarray(state.user_y),
                             np.asarray(state.obs_y)])
        valid = np.concatenate([np.asarray(state.user_valid),
                                np.asarray(state.obs_valid)])
        return np.stack([xs[valid], ys[valid]], axis=1).astype(np.int64)

    def _result_tuple(self, res, all_samples, all_obs, iter_curves,
                      return_lines):
        edge_trace = np.asarray(res.edge_trace)
        if self.return_std:
            cred = np.asarray(res.cred_interval)
            return edge_trace, (cred[0], cred[1])
        if not return_lines:
            return edge_trace
        return edge_trace, (all_samples, all_obs, iter_curves)

    # -- the trace ---------------------------------------------------------

    def __call__(self, print_final_diagnostics=False, show_init_post=False,
                 show_post_iter=False, verbose=False, return_lines=False):
        cfg, data = self.cfg, self.data
        state = init_state(cfg, user_obs_xy=self.obs)

        all_samples = []
        all_obs = [self.obs]
        iter_curves = []
        iter_costs = []

        if show_init_post:
            y_samples = np.asarray(preview_samples(cfg, data, state))
            all_samples.append(y_samples)
            from gaussian_process_edge_trace_tpu.utils.plotting import (
                plot_iter)
            plot_iter(self.x_grid, y_samples, 20, self.obs, self.init,
                      (self.M, self.N))
            print("Are you happy with your choice of kernel? y/n")
            cont = input()
            if cont.lower()[0] != "y":
                return None

        alg_st = time.time()
        introspective = show_post_iter or return_lines or verbose

        if introspective:
            while True:
                # One bulk D2H transfer per iteration (device->host round
                # trips are expensive through the TPU tunnel).
                h = jax.device_get(state)
                if not (int(h.n_fobs) < cfg.algo_thresh
                        and int(h.it) < cfg.max_iters):
                    state = h
                    break
                st = time.time()
                if verbose:
                    print("Fitting Gaussian process and computing next set "
                          "of observations...")
                prev_obs = self._obs_list(h)
                state, samples = trace_step(cfg, data, state)
                samples = np.asarray(samples)
                all_samples.append(samples)
                if show_post_iter:
                    from gaussian_process_edge_trace_tpu.utils.plotting \
                        import plot_iter
                    plot_iter(self.x_grid, samples, 20, prev_obs, self.init,
                              (self.M, self.N))
                h = jax.device_get(state)
                all_obs.append(self._obs_list(h))
                i = int(h.it) - 1
                iter_curves.append(np.stack(
                    [self.x_grid, h.iter_curves[i]], axis=1))
                iter_costs.append(float(h.iter_costs[i]))
                if verbose:
                    print(f"Number of observations: {int(h.n_fobs)}")
                    print(f"Iteration {int(h.it)} - Time Elapsed: "
                          f"{round(time.time() - st, 4)}\n\n")
            res = jax.device_get(finish_trace(cfg, data, state))
        else:
            # Single fused program; ONE bulk device->host transfer.
            res = jax.device_get(run_trace(cfg, data, state))
            n = int(res.n_iters)
            iter_curves = [np.stack(
                [self.x_grid, res.iter_curves[i]], axis=1)
                for i in range(n)]
            iter_costs = [float(c) for c in res.iter_costs[:n]]

        # Persist the adaptive threshold like the reference's mutable
        # attribute (gpet.py:595).
        n_it = int(res.n_iters)
        self.score_thresh = (float(res.iter_thresh[n_it - 1]) if n_it > 0
                             else float(cfg.score_thresh0))

        edge_trace = np.asarray(res.edge_trace)
        all_samples.append(np.asarray(res.y_mean))
        all_obs.append(self._obs_list_from_result(res))
        iter_curves.append(edge_trace[:, [1, 0]])
        iter_costs.append(float(res.final_cost))

        cred = np.asarray(res.cred_interval)
        if print_final_diagnostics:
            from gaussian_process_edge_trace_tpu.utils.plotting import (
                plot_diagnostics)
            plot_diagnostics(self.grad_img, self.x_grid, iter_curves,
                             iter_costs, (cred[0], cred[1]))
        if verbose:
            print(f"Time elapsed before algorithm converged: "
                  f"{round(time.time() - alg_st, 3)}")

        self.last_result = res
        return self._result_tuple(res, all_samples, all_obs, iter_curves,
                                  return_lines)

    def _obs_list_from_result(self, res):
        valid = np.asarray(res.obs_valid)
        return np.stack([np.asarray(res.obs_x)[valid],
                         np.asarray(res.obs_y)[valid]], axis=1).astype(
                             np.int64)
