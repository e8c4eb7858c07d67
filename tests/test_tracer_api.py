"""API-parity tests for the ``GP_Edge_Tracing`` wrapper class."""

import numpy as np
import jax.numpy as jnp

from gaussian_process_edge_trace_tpu import GP_Edge_Tracing
from gaussian_process_edge_trace_tpu.utils.image import (
    comp_grad_img, kernel_builder)
from gaussian_process_edge_trace_tpu.utils.metrics import trace_MSE
from gaussian_process_edge_trace_tpu.utils.synthetic import construct_test_img


def _setup(size=(96, 96)):
    img, edge = construct_test_img(size=size, amplitude=30, curvature=2,
                                   noise_level=0.02, ltype="sinusoidal",
                                   intensity=0.3, gaps=False)
    grad = np.asarray(comp_grad_img(img, kernel_builder((9, 5))))
    N = size[1]
    init = np.array([[0, edge[0, 0]], [N - 1, edge[N - 1, 0]]])
    return grad, edge, init


def _kw():
    return dict(kernel_options={"kernel": "RBF", "sigma_f": 25,
                                "length_scale": 8},
                noise_y=1, N_samples=150, score_thresh=0.5, delta_x=6,
                keep_ratio=0.1, pixel_thresh=5, seed=2, fix_endpoints=True)


def test_positional_signature_matches_reference():
    grad, edge, init = _setup()
    # Reference positional order (gpet.py:22-35): init, grad_img,
    # kernel_options, noise_y, obs, N_samples, score_thresh, delta_x,
    # keep_ratio, pixel_thresh, seed, return_std, fix_endpoints.
    tracer = GP_Edge_Tracing(
        init, grad, (1, 3, 3), 1, np.array([], dtype=np.int8), 150, 0.5,
        6, 0.1, 5, 2, False, True)
    out = tracer()
    assert isinstance(out, np.ndarray)
    assert out.shape == (tracer.edge_length, 2)


def test_return_std_tuple():
    grad, edge, init = _setup()
    tracer = GP_Edge_Tracing(init, grad, return_std=True, **_kw())
    edge_pred, credint = tracer()
    assert edge_pred.shape == (tracer.edge_length, 2)
    lo, hi = credint
    assert lo.shape == hi.shape == (tracer.edge_length,)
    assert np.all(hi >= lo)
    mse = float(trace_MSE(jnp.asarray(edge_pred),
                          jnp.asarray(edge[: grad.shape[1]])))
    # Small 96x96 config with few observations: one mis-selected pixel can
    # cost ~10 MSE (the reference has the same variance); the tight
    # accuracy bound lives in test_driver.py on the 128x128 config.
    assert mse < 15.0, mse


def test_return_lines_and_introspective_path_match_fused():
    grad, edge, init = _setup()
    t1 = GP_Edge_Tracing(init, grad, **_kw())
    pred_fused = t1()
    t2 = GP_Edge_Tracing(init, grad, **_kw())
    pred_intro, (all_samples, all_obs, iter_curves) = t2(return_lines=True)
    # Introspective and fused paths run identical jitted numerics.
    np.testing.assert_array_equal(pred_fused, pred_intro)
    # One sample block per iteration plus the final mean.
    n_iter = len(iter_curves) - 1
    assert len(all_samples) == n_iter + 1
    assert len(all_obs) == n_iter + 2  # initial obs + per-iter + final
    assert all_samples[0].shape == (t2.edge_length, t2.N_samples)
    assert iter_curves[-1].shape == (t2.edge_length, 2)


def test_clamps_match_reference():
    grad, edge, init = _setup()
    # N_samples <= 100 -> 1000 (gpet.py:99); delta_x <= 3 -> 2 (gpet.py:105);
    # keep_ratio out of (0,1] -> 0.1; N_keep uses raw args (gpet.py:118).
    tracer = GP_Edge_Tracing(init, grad, N_samples=50, delta_x=3,
                             keep_ratio=1.5, pixel_thresh=1)
    assert tracer.N_samples == 1000
    assert tracer.delta_x == 2
    assert tracer.keep_ratio == 0.1
    assert tracer.pixel_thresh == 2
    assert tracer.N_keep == int(1.5 * 50)
    assert tracer.N_subints == tracer.edge_length // 2
    assert tracer.algo_thresh == tracer.N_subints - 1


def test_warm_start_obs_argument():
    grad, edge, init = _setup()
    xs = np.arange(8, 88, 13)
    obs = np.stack([xs, edge[xs, 0]], axis=1)
    tracer = GP_Edge_Tracing(init, grad, obs=obs, **_kw())
    pred = tracer()
    mse = float(trace_MSE(jnp.asarray(pred),
                          jnp.asarray(edge[: grad.shape[1]])))
    # 96x96 config: same long-tailed seed spread as test_return_std_tuple.
    assert mse < 20.0, mse


def test_reference_module_aliases():
    # The reference package layout: `from gp_edge_tracing import gpet,
    # gpet_utils` and the vendored `sklearn_gpr` module.
    from gaussian_process_edge_trace_tpu import gpet, gpet_utils, sklearn_gpr
    assert gpet.GP_Edge_Tracing is GP_Edge_Tracing
    assert hasattr(gpet_utils, "kernel_builder")
    assert hasattr(sklearn_gpr, "GaussianProcessRegressor")
    assert hasattr(sklearn_gpr, "WeightedWhiteKernel")
