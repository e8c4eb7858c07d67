"""Smoke tests for the host-side matplotlib diagnostics and the tracer's
interactive/verbose paths (reference C14, gpet.py:666-764,805-812)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from gaussian_process_edge_trace_tpu import GP_Edge_Tracing
from gaussian_process_edge_trace_tpu.utils.image import (
    comp_grad_img, kernel_builder)
from gaussian_process_edge_trace_tpu.utils.plotting import (
    plot_diagnostics, plot_iter, plot_results)
from gaussian_process_edge_trace_tpu.utils.synthetic import construct_test_img


def _setup(size=(64, 64)):
    img, edge = construct_test_img(size=size, amplitude=20, curvature=2,
                                   noise_level=0.01, ltype="sinusoidal",
                                   intensity=0.3, gaps=False)
    grad = np.asarray(comp_grad_img(img, kernel_builder((7, 3))))
    N = size[1]
    init = np.array([[0, edge[0, 0]], [N - 1, edge[N - 1, 0]]])
    return img, grad, edge, init


def _tracer(grad, init, **kw):
    return GP_Edge_Tracing(
        init, grad,
        kernel_options={"kernel": "RBF", "sigma_f": 18, "length_scale": 6},
        noise_y=1, N_samples=120, score_thresh=0.5, delta_x=5,
        keep_ratio=0.25, pixel_thresh=4, seed=7, fix_endpoints=True, **kw)


def test_plot_functions_build_figures():
    img, grad, edge, init = _setup()
    E = grad.shape[1]
    x_grid = np.arange(E)
    samples = 30 + 5 * np.random.RandomState(0).standard_normal((E, 25))
    fig1 = plot_iter(x_grid, samples, 10, np.zeros((0, 2)), init,
                     grad.shape, show=False)
    curves = [np.stack([x_grid, samples[:, i]], axis=1) for i in range(3)]
    fig2 = plot_diagnostics(grad, x_grid, curves, [3.0, 2.0, 1.5],
                            credint=(samples[:, 0] - 2, samples[:, 0] + 2),
                            show=False)
    pred = np.stack([edge[:E, 0], x_grid], axis=1)
    fig3 = plot_results(pred, edge[:E], img, grad,
                        credint=(edge[:E, 0] - 2.0, edge[:E, 0] + 2.0),
                        show=False)
    for f in (fig1, fig2, fig3):
        assert f is not None
    import matplotlib.pyplot as plt
    plt.close("all")


@pytest.mark.slow
def test_verbose_and_final_diagnostics(monkeypatch, capsys):
    import matplotlib.pyplot as plt
    monkeypatch.setattr(plt, "show", lambda: None)
    _, grad, edge, init = _setup()
    tracer = _tracer(grad, init)
    out = tracer(print_final_diagnostics=True, verbose=True)
    assert out.shape == (tracer.edge_length, 2)
    text = capsys.readouterr().out
    assert "Number of observations" in text
    assert "Time elapsed" in text
    plt.close("all")


def test_show_init_post_abort(monkeypatch):
    import matplotlib.pyplot as plt
    monkeypatch.setattr(plt, "show", lambda: None)
    monkeypatch.setattr("builtins.input", lambda: "n")
    _, grad, edge, init = _setup()
    tracer = _tracer(grad, init)
    # Reference returns None when the user rejects the kernel preview
    # (gpet.py:809-812).
    assert tracer(show_init_post=True) is None
    plt.close("all")


def test_show_init_post_continue(monkeypatch):
    import matplotlib.pyplot as plt
    monkeypatch.setattr(plt, "show", lambda: None)
    monkeypatch.setattr("builtins.input", lambda: "y")
    _, grad, edge, init = _setup()
    tracer = _tracer(grad, init)
    out = tracer(show_init_post=True, show_post_iter=True)
    assert out.shape == (tracer.edge_length, 2)
    plt.close("all")
