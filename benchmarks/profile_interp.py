"""Perf lab: decompose the fused-trace cost and A/B interp kernels.

Run on the real TPU: ``python -m benchmarks.profile_interp``.
Measures (dispatch-corrected, see CLAUDE.md measurement gotcha):
  1. full trace / one iteration / final fit split,
  2. standalone column-interp variants at demo shapes.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import gaussian_process_edge_trace_tpu as gpt
    from gaussian_process_edge_trace_tpu.trace.driver import (
        finish_trace, init_state, make_config, make_data, run_trace,
        trace_step)

    def sync():
        _ = float(jnp.sum(jnp.ones((8,))))

    sync()
    base = None

    def med(f, *a, k=7):
        nonlocal base
        jax.block_until_ready(f(*a))
        ts = []
        for _ in range(k):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*a))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2] * 1e3

    base = med(jax.jit(lambda v: v + 1.0), jnp.ones((8,)), k=15)
    log(f"dispatch baseline: {base:.2f} ms")

    def corr(f, *a, k=7):
        return max(med(f, *a, k=k) - base, 0.0)

    # --- demo config -------------------------------------------------------
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

    t_step = corr(lambda: trace_step(cfg, data, state0))
    log(f"one iteration (first): {t_step:.2f} ms")

    # converged state for the final fit
    state = state0
    for _ in range(n_it):
        state, _ = trace_step(cfg, data, state)
    state = jax.block_until_ready(state)
    t_fin = corr(lambda: finish_trace(cfg, data, state))
    log(f"final fit: {t_fin:.2f} ms")
    log(f"accounting: {n_it} iters x {t_step:.2f} + {t_fin:.2f} = "
        f"{n_it * t_step + t_fin:.1f} (vs full {t_full:.1f})")

    # --- standalone interp variants ---------------------------------------
    from gaussian_process_edge_trace_tpu.ops import pallas_interp as pi

    E, M, S = 500, 500, 1000
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.random((E, M)), jnp.float32)
    ys = jnp.asarray(rng.random((E, S)) * (M - 1), jnp.float32)

    ref = np.asarray(pi._column_interp_gather(cols, ys))

    def check(name, fn):
        out = jax.block_until_ready(fn(cols, ys))
        err = float(np.max(np.abs(np.asarray(out) - ref)))
        t = corr(fn, cols, ys)
        log(f"  {name:28s} {t:7.3f} ms  maxerr={err:.2e}")

    log(f"standalone interp, E={E} M={M} S={S}:")
    check("pallas matvec (current)", pi._column_interp_pallas)
    check("xla gather", jax.jit(pi._column_interp_gather))

    @jax.jit
    def xla_hat(cols, ys):
        rows = jnp.arange(M, dtype=jnp.float32)
        y = jnp.clip(ys, 0.0, M - 1.0)
        hat = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, :, None] - rows))
        return jnp.sum(hat * cols[:, None, :], axis=-1)

    check("xla fused hat mul-reduce", xla_hat)
    check("pallas two-level (current)", pi._column_interp_pallas_2l)


if __name__ == "__main__":
    main()
