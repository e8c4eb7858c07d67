"""Unit tests for utils: image preprocessing, synthetic data, metrics.

Oracles are independent numpy/scipy implementations of the formulas cited in
SURVEY.md §2 (C13, C15, C16, C17, C19).
"""

import numpy as np
import pytest
import scipy.ndimage

from gaussian_process_edge_trace_tpu.utils import (
    kernel_builder, normalise, comp_grad_img, denoise,
    construct_test_img, trace_MSE, trace_relarea, trace_dicecoef)


def _kernel_oracle(size, unit=False):
    # Independent oracle for the extended-Sobel formula
    # (reference gpet_utils.py:33-47).
    N, M = size
    k = np.zeros(size)
    mid_r, mid_c = N // 2, M // 2
    for i in range(mid_r):
        for j in range(M):
            if unit:
                k[i, j] = 1
            else:
                k[i, j] = 1 + max(0, mid_r + 1 - abs(i - mid_r) - abs(j - mid_c))
    k[mid_r + 1:, :] = -np.flip(k[0:mid_r, :], axis=0)
    return k


@pytest.mark.parametrize("size", [(11, 5), (3, 3), (7, 9), (5, 1)])
@pytest.mark.parametrize("unit", [False, True])
def test_kernel_builder_matches_formula(size, unit):
    np.testing.assert_array_equal(
        kernel_builder(size, unit=unit), _kernel_oracle(size, unit=unit))


def test_kernel_builder_flags():
    base = kernel_builder((11, 5))
    np.testing.assert_array_equal(kernel_builder((11, 5), b2d=True),
                                  np.flipud(base))
    np.testing.assert_array_equal(kernel_builder((11, 5), vertical_edges=True),
                                  base.T)
    np.testing.assert_allclose(kernel_builder((11, 5), normalize=True),
                               base / base.max())


def test_normalise_range_and_values():
    rng = np.random.RandomState(0)
    img = rng.rand(40, 30) * 7 - 3
    out = np.asarray(normalise(img, (0, 1)))
    expected = (img - img.min()) / (img.max() - img.min())
    np.testing.assert_allclose(out, expected, atol=1e-6)
    out2 = np.asarray(normalise(img, (-2, 5)))
    np.testing.assert_allclose(out2.min(), -2, atol=1e-5)
    np.testing.assert_allclose(out2.max(), 5, atol=1e-5)


def test_comp_grad_img_matches_scipy():
    rng = np.random.RandomState(1)
    img = rng.rand(64, 48)
    kernel = kernel_builder((11, 5))
    grad = scipy.ndimage.convolve(img, kernel, mode="nearest")
    grad[grad < 0] = 0
    expected = (grad - grad.min()) / (grad.max() - grad.min())
    out = np.asarray(comp_grad_img(img, kernel))
    np.testing.assert_allclose(out, expected, atol=2e-5)


def test_comp_grad_img_norm_flag_fixed():
    # The reference ignores norm=False (latent bug, gpet_utils.py:114);
    # we honour it (SURVEY.md C17).
    rng = np.random.RandomState(2)
    img = rng.rand(16, 16) * 10
    kernel = kernel_builder((3, 3))
    out = np.asarray(comp_grad_img(img, kernel, norm=False))
    assert out.dtype.kind == "i"
    grad = scipy.ndimage.convolve(img.astype(np.float32),
                                  kernel.astype(np.float32), mode="nearest")
    grad[grad < 0] = 0
    np.testing.assert_array_equal(out, grad.astype(int))


def test_denoise_gaussian_matches_scipy():
    rng = np.random.RandomState(3)
    img = rng.rand(32, 32).astype(np.float32)
    # scipy default boundary mode is 'reflect'; 'nearest' via kwarg
    # forwarding (gpet_utils.py:144 passes kwargs straight to scipy).
    out = np.asarray(denoise(img, "gaussian", {"sigma": 1.5}))
    expected = scipy.ndimage.gaussian_filter(img, sigma=1.5)
    np.testing.assert_allclose(out, expected, atol=1e-4)
    out_n = np.asarray(denoise(img, "gaussian",
                               {"sigma": 1.5, "mode": "nearest"}))
    expected_n = scipy.ndimage.gaussian_filter(img, sigma=1.5,
                                               mode="nearest")
    np.testing.assert_allclose(out_n, expected_n, atol=1e-4)


def test_denoise_median_minimum():
    rng = np.random.RandomState(4)
    img = rng.rand(20, 20).astype(np.float32)
    out = np.asarray(denoise(img, "median", {"size": 3, "mode": "nearest"}))
    expected = scipy.ndimage.median_filter(img, size=3, mode="nearest")
    np.testing.assert_allclose(out, expected, atol=1e-6)
    out = np.asarray(denoise(img, "minimum", {"size": 3}))
    expected = scipy.ndimage.minimum_filter(img, size=3)  # default reflect
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_construct_test_img_sinusoidal():
    M = N = 128
    img, edge = construct_test_img((M, N), amplitude=60, curvature=4,
                                   noise_level=0.0, ltype="sinusoidal",
                                   intensity=0.3, gaps=False)
    assert img.shape == (M, N)
    assert edge.shape == (N, 2)
    # Edge is yx-space; below-edge pixels hold `intensity`.
    x = np.linspace(-np.pi, np.pi, N)
    expected_rows = (np.rint((60 // 2) * np.sin(N * 4 * x)) + M // 2).astype(int)
    np.testing.assert_array_equal(edge[:, 0], expected_rows)
    for j in [0, 17, 63, 127]:
        r = edge[j, 0]
        assert np.all(img[r:, j] == 0.3)
        if r > 0:
            assert np.all(img[:r, j] == 0.0)


def test_construct_test_img_gaps_and_noise_determinism():
    img1, _ = construct_test_img((200, 200), 80, 2, 0.05, "sinusoidal", 0.3,
                                 gaps=True)
    img2, _ = construct_test_img((200, 200), 80, 2, 0.05, "sinusoidal", 0.3,
                                 gaps=True)
    np.testing.assert_array_equal(img1, img2)
    assert img1.min() >= 0.0 and img1.max() <= 1.0


def test_construct_test_img_families():
    for ltype in ["multi-sinusoidal", "close multi-sinusoidal",
                  "co-sinusoidal", "diag", "straight"]:
        img, edge = construct_test_img((100, 100), 40, 1, 0.0, ltype, 0.4)
        assert img.shape == (100, 100)
        assert edge.shape[1] == 2


def test_trace_metrics_against_formulas():
    rng = np.random.RandomState(5)
    N = 50
    true = np.stack([rng.randint(5, 45, N), np.arange(N)], axis=1)
    pred = true.copy()
    pred[:, 0] = np.clip(true[:, 0] + rng.randint(-3, 4, N), 0, N - 1)

    mse = float(trace_MSE(pred, true))
    assert mse == pytest.approx(
        np.round(np.mean((pred[:, 0] - true[:, 0]) ** 2), 4), abs=1e-3)

    ra = float(trace_relarea(pred, true))
    ta = np.sum(N - true[:, 0]) / N ** 2
    pa = np.sum(N - pred[:, 0]) / N ** 2
    assert ra == pytest.approx(np.round(abs((ta - pa) / ta), 5), abs=1e-4)

    # DICE oracle via explicit mask fill (gpet_utils.py:303-313).
    pb = np.zeros((N, N))
    tb = np.zeros((N, N))
    for i in range(N):
        pb[pred[i, 0]:, i] = 1
        tb[true[i, 0]:, i] = 1
    jacc = np.sum(pb * tb) / np.sum(np.clip(pb + tb, 0, 1))
    assert float(trace_dicecoef(pred, true)) == pytest.approx(
        np.round(2 * jacc / (jacc + 1), 4), abs=1e-3)
    assert float(trace_dicecoef(pred, true, jaccard=True)) == pytest.approx(
        np.round(jacc, 4), abs=1e-3)

    # Perfect prediction.
    assert float(trace_dicecoef(true, true)) == 1.0
    assert float(trace_MSE(true, true)) == 0.0


def test_trace_dicecoef_negative_row_wraps_like_reference():
    # The reference fills pred_bin[int(y):, i] = 1; a negative y wraps
    # via Python slicing and fills only the last |y| rows.
    N = 12
    true = np.stack([np.full(N, 4), np.arange(N)], axis=1)
    pred = true.copy()
    pred[3, 0] = -3
    pb = np.zeros((N, N))
    tb = np.zeros((N, N))
    for i in range(N):
        pb[pred[i, 0]:, i] = 1
        tb[true[i, 0]:, i] = 1
    jacc = np.sum(pb * tb) / np.sum(np.clip(pb + tb, 0, 1))
    want = np.round(2 * jacc / (jacc + 1), 4)
    assert float(trace_dicecoef(pred, true)) == pytest.approx(float(want),
                                                              abs=1e-3)
