"""Trace-pipeline unit tests vs the NumPy reference oracles."""

import numpy as np
import pytest
import jax.numpy as jnp

from gaussian_process_edge_trace_tpu.trace.kde import curve_kde, gradient_kde
from gaussian_process_edge_trace_tpu.trace.scoring import (
    best_curves, curve_costs)
from gaussian_process_edge_trace_tpu.trace.select import (
    make_bin_spec, select_pixels)

from reference_oracle import (
    oracle_cost, oracle_gradient_kde, oracle_kde, oracle_kde_direct,
    oracle_select)


# ---------------------------------------------------------------------------
# KDE
# ---------------------------------------------------------------------------

def _random_curves(rng, M, N, x_st, E, S):
    y = (M / 2 + (M / 4) * np.sin(np.linspace(0, 3, E))[:, None]
         + rng.normal(0, M / 10, (E, S)))
    return y


def test_curve_kde_matches_oracle():
    rng = np.random.RandomState(0)
    M, N, x_st, E, S = 37, 53, 4, 45, 7
    y = _random_curves(rng, M, N, x_st, E, S)
    # Push some points out of the image to exercise the deletion rule.
    y[:, 0] += M
    w = rng.uniform(0.5, 2.0, S)

    got = np.asarray(curve_kde(jnp.asarray(y), jnp.asarray(w), M, N, x_st))

    xs = np.arange(x_st, x_st + E)
    pts = np.stack([np.tile(xs[:, None], (1, S)).ravel(), y.ravel()], axis=1)
    wpts = np.tile(w[None, :], (E, 1)).ravel()
    want = oracle_kde(pts, wpts, M, N)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("E,S,M", [
    (500, 100, 500),     # demo kept-curve shape (below the TPU gate)
    (37, 33, 129),       # E % _BLK2L != 0 (padded rows), odd M
    (48, 5000, 257),     # 3 chunks + masked S edge under the patched
                         # _S_BLK2L=2048 below
    (1000, 1000, 1000),  # the 1000² S=10⁴ kept-curve shape
])
def test_binning_2l_matches_dense(E, S, M, monkeypatch):
    """trace/pallas_kde._binning_2l (the two-level ADJOINT binning: compact
    taps + block one-hot MXU contraction, VERDICT r4 item 1c) vs the dense
    hat contraction, via the interpret-mode pallas_call on CPU. The gate
    (column_binning, TPU-only) never reaches it off-TPU, so this calls it
    directly; the on-hardware pin is utils/selftest.py::_check_binning_2l.
    Includes exact integers, the image edges and out-of-image sentinels;
    also forces multi-chunk accumulation + the masked S edge chunk by
    shrinking _S_BLK2L."""
    import jax

    from gaussian_process_edge_trace_tpu.trace import pallas_kde as pk

    monkeypatch.setattr(pk, "_S_BLK2L", 2048)  # force chunked + edge mask
    rng = np.random.default_rng(7)
    y = np.asarray(rng.uniform(-3, M + 2, (E, S)), np.float32)
    y[:, :4] = [0.0, M - 1.0, M / 2, -1.0]
    yj = jnp.asarray(y)
    w = jnp.asarray(rng.random(S), jnp.float32)
    ref = np.asarray(pk._binning_dense_chunked(yj, w, M))
    got = np.asarray(jax.jit(
        lambda a, b: pk._binning_2l.__wrapped__(a, b, M))(yj, w))
    np.testing.assert_allclose(got, ref, rtol=1e-5,
                               atol=1e-6 * np.max(np.abs(ref)))


def test_curve_kde_close_to_direct_gaussian_sum():
    # Binned KDE must preserve the *shape* of the direct Gaussian-sum KDE
    # (rank correlation drives pixel selection, SURVEY.md §7).
    rng = np.random.RandomState(1)
    M, N, x_st, E, S = 30, 40, 2, 35, 5
    y = _random_curves(rng, M, N, x_st, E, S)
    w = rng.uniform(0.5, 2.0, S)
    got = np.asarray(curve_kde(jnp.asarray(y), jnp.asarray(w), M, N, x_st))
    xs = np.arange(x_st, x_st + E)
    pts = np.stack([np.tile(xs[:, None], (1, S)).ravel(), y.ravel()], axis=1)
    wpts = np.tile(w[None, :], (E, 1)).ravel()
    direct = oracle_kde_direct(pts, wpts, M, N)
    # Linear binning at bw=1 carries an inherent few-percent discretisation
    # error vs the exact Gaussian sum — KDEpy's FFTKDE has the same one.
    np.testing.assert_allclose(got, direct, atol=0.06)
    corr = np.corrcoef(got.ravel(), direct.ravel())[0, 1]
    assert corr > 0.999


def test_separable_blur_per_axis_gate(monkeypatch):
    """The blur size gate is per axis (gpet.py:514's FFTKDE blurs any
    (M, N)): a grid with one long axis runs that axis as shifted FMAs and
    the short one as a Toeplitz matmul, and every gate combination agrees
    with the all-dense form (same separable convolution, f64 oracle)."""
    from gaussian_process_edge_trace_tpu.trace import kde

    rng = np.random.RandomState(7)
    grid = jnp.asarray(rng.uniform(0, 1, (40, 90)))
    taps = kde.gaussian_taps(kde.DEFAULT_RADIUS, 1.0, grid.dtype)
    dense = np.asarray(kde._separable_blur(grid, taps))

    monkeypatch.setattr(kde, "_BLUR_MATMUL_MAX", 64)  # axis0 dense, axis1 FMA
    mixed = np.asarray(kde._separable_blur(grid, taps))
    # blur_matrices must hand back (Ty, None) in this regime, and feeding
    # that tuple through reproduces the self-gated result.
    mats = kde.blur_matrices(38, 88, dtype=grid.dtype)  # +2 pad -> (40, 90)
    assert mats[0] is not None and mats[1] is None
    via_mats = np.asarray(kde._separable_blur(grid, taps, mats=mats))

    monkeypatch.setattr(kde, "_BLUR_MATMUL_MAX", 10)   # both axes FMA
    fma = np.asarray(kde._separable_blur(grid, taps))
    assert kde.blur_matrices(38, 88, dtype=grid.dtype) is None

    np.testing.assert_allclose(mixed, dense, rtol=0, atol=1e-14)
    np.testing.assert_allclose(via_mats, mixed, rtol=0, atol=1e-14)
    np.testing.assert_allclose(fma, dense, rtol=0, atol=1e-14)


def test_gradient_kde_matches_oracle():
    rng = np.random.RandomState(2)
    M, N = 41, 33
    grad = rng.uniform(0, 1, (M, N))
    grad[grad < 0.4] = 0.0
    got = np.asarray(gradient_kde(jnp.asarray(grad)))
    want = oracle_gradient_kde(grad)
    np.testing.assert_allclose(got, want, atol=1e-6)


# ---------------------------------------------------------------------------
# Curve cost
# ---------------------------------------------------------------------------

def test_curve_costs_match_oracle():
    rng = np.random.RandomState(3)
    M, N, x_st, E, S = 48, 64, 5, 50, 9
    grad = rng.uniform(0, 1, (M, N))
    x = np.arange(x_st, x_st + E)
    y = _random_curves(rng, M, N, x_st, E, S)
    got = np.asarray(curve_costs(jnp.asarray(grad), jnp.asarray(x),
                                 jnp.asarray(y)))
    want = np.array([oracle_cost(grad, x, y[:, s]) for s in range(S)])
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_curve_costs_fused_and_unfused_paths_agree(monkeypatch):
    """curve_costs' fused early-return and the unfused reductions compute
    the same costs (ADVICE r4): on CPU the fused arm is forced by
    monkeypatching the (backend-gated) fused_curve_cost with a direct
    _fused_cost_call, so a future eligibility-gate change cannot silently
    fork the cost semantics between the two paths."""
    import jax.numpy as jnp

    from gaussian_process_edge_trace_tpu.ops import pallas_interp as pi
    from gaussian_process_edge_trace_tpu.trace import scoring

    rng = np.random.RandomState(5)
    M, N, x_st, E, S = 64, 80, 3, 48, 160   # even E, eligible shape
    grad = rng.uniform(0, 1, (M, N))
    x = np.arange(x_st, x_st + E)
    y = _random_curves(rng, M, N, x_st, E, S)

    # Unjitted call so the monkeypatched global is actually consulted
    # (the jit cache would otherwise replay the first-traced path).
    fn = scoring.curve_costs.__wrapped__
    unfused_cost = np.asarray(
        fn(jnp.asarray(grad), jnp.asarray(x), jnp.asarray(y),
           kde_thresh=1e-3, cols=None, even="simpson"))

    def forced_fused(cols, ys, kde_thresh=0.0):
        assert cols.shape[0] % 2 == 0, "fused path requires even E"
        return pi._fused_cost_jit(jnp.asarray(cols, jnp.float32),
                                  jnp.asarray(ys, jnp.float32),
                                  float(kde_thresh))

    monkeypatch.setattr(scoring, "fused_curve_cost", forced_fused)
    fused_cost = np.asarray(
        fn(jnp.asarray(grad), jnp.asarray(x), jnp.asarray(y),
           kde_thresh=1e-3, cols=None, even="simpson"))

    # Fused kernel is f32; the unfused CPU path runs f64 under the test
    # config — agreement to f32 accumulation accuracy.
    np.testing.assert_allclose(fused_cost, unfused_cost, rtol=2e-4)


def test_best_curves_topk():
    rng = np.random.RandomState(4)
    E, S, K = 20, 30, 5
    ys = rng.normal(size=(E, S))
    costs = rng.uniform(1, 2, S)
    bc, bcosts = best_curves(jnp.asarray(ys), jnp.asarray(costs), K)
    order = np.argsort(costs)[:K]
    np.testing.assert_allclose(np.asarray(bcosts), costs[order])
    np.testing.assert_allclose(np.asarray(bc), ys[:, order])


# ---------------------------------------------------------------------------
# Pixel selection
# ---------------------------------------------------------------------------

def _run_select(kde, gkde, pre_xy, thresh, x_st, x_en, delta_x,
                pixel_thresh, algo_thresh, fix_endpoints):
    M, N = kde.shape
    spec = make_bin_spec(N, x_st, x_en, delta_x)
    B = spec.n_bins
    P = max(len(pre_xy), 1)
    ox = np.zeros(P, np.int32)
    oy = np.zeros(P, np.int32)
    ov = np.zeros(P, bool)
    for i, (x, y) in enumerate(pre_xy):
        ox[i], oy[i], ov[i] = x, y, True
    sel = select_pixels(
        jnp.asarray(kde), jnp.asarray(gkde), jnp.asarray(ox),
        jnp.asarray(oy), jnp.asarray(ov),
        jnp.asarray(len(pre_xy), jnp.int32),
        jnp.asarray(thresh, jnp.float64), spec,
        fix_endpoints, 1e-3, pixel_thresh, algo_thresh)
    got = {(int(x), int(y))
           for x, y, v in zip(sel.obs_x, sel.obs_y, sel.obs_valid) if v}
    return got, float(sel.score_thresh), int(sel.n_fobs)


@pytest.mark.parametrize("fix_endpoints", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_select_matches_oracle(seed, fix_endpoints):
    rng = np.random.RandomState(seed)
    M, N = 40, 60
    x_st, x_en, delta_x = 3, 55, 5
    pixel_thresh, algo_thresh = 3, 8
    # A KDE concentrated near a band, so candidates are sparse.
    kde = np.zeros((M, N))
    yc = (M / 2 + 6 * np.sin(np.linspace(0, 3, N))).astype(int)
    for x in range(N):
        kde[max(yc[x] - 3, 0):yc[x] + 3, x] = rng.uniform(0.2, 1.0, size=(
            min(yc[x] + 3, M) - max(yc[x] - 3, 0)))
    kde /= kde.max()
    gkde = rng.uniform(0, 1, (M, N))
    pre_xy = [(10, yc[10]), (25, yc[25] + 1), (40, 0)]  # last: kde=0, drops

    want_fobs, want_thresh = oracle_select(
        kde, gkde, np.array(pre_xy), 0.7, x_st, x_en, delta_x,
        pixel_thresh, algo_thresh, fix_endpoints)
    got, got_thresh, got_n = _run_select(
        kde, gkde, pre_xy, 0.7, x_st, x_en, delta_x, pixel_thresh,
        algo_thresh, fix_endpoints)

    assert got_n == want_fobs.shape[0]
    assert got == {(int(x), int(y)) for x, y in want_fobs}
    np.testing.assert_allclose(got_thresh, want_thresh, rtol=1e-6)


def test_select_no_decay_on_first_pass():
    # If enough bins pass at the initial threshold, it must not decay
    # (gpet.py:594-595: the first inner pass multiplies by 1.0).
    rng = np.random.RandomState(7)
    M, N = 20, 40
    kde = rng.uniform(0.5, 1.0, (M, N))
    gkde = rng.uniform(0.5, 1.0, (M, N))
    got, thresh, n = _run_select(kde, gkde, [], 0.3, 2, 37, 5,
                                 2, 5, False)
    assert thresh == pytest.approx(0.3)
    assert n >= 5
