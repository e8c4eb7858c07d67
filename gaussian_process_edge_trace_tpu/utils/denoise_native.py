"""JAX-native denoisers and image-quality metrics (reference C18,
gpet_utils.py:122-158).

The reference dispatches to scikit-image/scipy denoisers and quality
metrics. This module provides device-native implementations so the
``denoise`` surface works without scikit-image:

- :func:`denoise_tv_chambolle` — Chambolle's projection algorithm for the
  ROF total-variation model (the ``tvc`` technique), a fixed-iteration
  ``lax.fori_loop`` of forward-difference/divergence updates;
- :func:`denoise_nl_means` — non-local means on a dense window of patch
  offsets (patch L2 distances via shifted box sums — convolution-style
  shifted FMAs, no gathers);
- quality metrics matching skimage semantics for the reference's verbose
  report (gpet_utils.py:151-156): :func:`peak_signal_noise_ratio`,
  :func:`normalized_root_mse` (min-max), :func:`structural_similarity`
  (uniform 7×7 filter, skimage defaults), :func:`shannon_entropy`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_iter",))
def denoise_tv_chambolle(image, weight=0.1, n_iter=100):
    """Chambolle 2004 dual projection for the ROF model.

    Matches ``skimage.restoration.denoise_tv_chambolle`` semantics (same
    dual update with step 1/4 in 2-D and the same weight convention) with
    a fixed iteration count instead of an eps-based stop.
    """
    img = jnp.asarray(image, jnp.float32)
    tau = 0.25
    w = jnp.asarray(weight, jnp.float32)

    def grad(u):
        gy = jnp.concatenate([u[1:] - u[:-1], jnp.zeros_like(u[:1])], 0)
        gx = jnp.concatenate([u[:, 1:] - u[:, :-1],
                              jnp.zeros_like(u[:, :1])], 1)
        return gy, gx

    def div(py, px):
        dy = jnp.concatenate([py[:1], py[1:-1] - py[:-2], -py[-2:-1]], 0)
        dx = jnp.concatenate([px[:, :1], px[:, 1:-1] - px[:, :-2],
                              -px[:, -2:-1]], 1)
        return dy + dx

    def body(_, p):
        # Chambolle 2004: p ← (p − (τ/λ)∇u) / (1 + (τ/λ)|∇u|) with
        # u = f − λ·div p (∇(div p − f/λ) = −∇u/λ).
        py, px = p
        u = img - w * div(py, px)
        gy, gx = grad(u)
        norm = jnp.sqrt(gy * gy + gx * gx)
        denom = 1.0 + (tau / w) * norm
        py = (py - (tau / w) * gy) / denom
        px = (px - (tau / w) * gx) / denom
        return (py, px)

    p0 = (jnp.zeros_like(img), jnp.zeros_like(img))
    py, px = jax.lax.fori_loop(0, n_iter, body, p0)
    return img - w * div(py, px)


@functools.partial(jax.jit,
                   static_argnames=("patch_size", "patch_distance"))
def denoise_nl_means(image, patch_size=7, patch_distance=11, h=0.1,
                     sigma=0.0):
    """Non-local means over a dense offset window.

    For every offset d in the (2·patch_distance+1)² search window, the
    per-pixel patch distance is a box filter of the shifted squared
    difference — shifted FMAs and separable box sums only (TPU-friendly;
    no gathers). Weights follow skimage's fast NL-means convention:
    ``exp(-max(dist² - 2σ², 0) / h²)``.
    """
    img = jnp.asarray(image, jnp.float32)
    H, W = img.shape
    pr = patch_size // 2
    pad = patch_distance + pr
    padded = jnp.pad(img, pad, mode="reflect")

    def box2d(a):
        # Separable box filter via cumulative sums (valid region crop).
        k = patch_size
        c = jnp.cumsum(jnp.pad(a, ((1, 0), (0, 0))), axis=0)
        a = (c[k:] - c[:-k])
        c = jnp.cumsum(jnp.pad(a, ((0, 0), (1, 0))), axis=1)
        a = (c[:, k:] - c[:, :-k])
        return a / (k * k)

    num = jnp.zeros((H, W), jnp.float32)
    den = jnp.zeros((H, W), jnp.float32)
    centre = padded[pad - pr:pad + H + pr, pad - pr:pad + W + pr]
    for dy in range(-patch_distance, patch_distance + 1):
        for dx in range(-patch_distance, patch_distance + 1):
            shifted = jax.lax.dynamic_slice(
                padded, (pad + dy - pr, pad + dx - pr),
                (H + 2 * pr, W + 2 * pr))
            d2 = box2d((centre - shifted) ** 2)          # (H, W)
            wgt = jnp.exp(-jnp.maximum(d2 - 2.0 * sigma * sigma, 0.0)
                          / (h * h))
            val = jax.lax.dynamic_slice(padded, (pad + dy, pad + dx),
                                        (H, W))
            num = num + wgt * val
            den = den + wgt
    return num / den


def peak_signal_noise_ratio(image_true, image_test, data_range=None):
    """skimage.metrics.peak_signal_noise_ratio."""
    a = jnp.asarray(image_true, jnp.float64)
    b = jnp.asarray(image_test, jnp.float64)
    if data_range is None:
        data_range = jnp.max(a) - jnp.min(a)
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10((data_range ** 2) / mse)


def normalized_root_mse(image_true, image_test, normalization="min-max"):
    """skimage.metrics.normalized_root_mse (min-max / euclidean / mean)."""
    a = jnp.asarray(image_true, jnp.float64)
    b = jnp.asarray(image_test, jnp.float64)
    rmse = jnp.sqrt(jnp.mean((a - b) ** 2))
    if normalization == "min-max":
        return rmse / (jnp.max(a) - jnp.min(a))
    if normalization == "euclidean":
        return rmse / jnp.sqrt(jnp.mean(a * a))
    return rmse / jnp.mean(a)


def structural_similarity(im1, im2, data_range=None, win_size=7):
    """skimage.metrics.structural_similarity with the default uniform
    filter (gaussian_weights=False), K1=0.01, K2=0.03."""
    a = jnp.asarray(im1, jnp.float64)
    b = jnp.asarray(im2, jnp.float64)
    if data_range is None:
        data_range = jnp.max(a) - jnp.min(a)
    k = win_size

    def ufilt(x):
        c = jnp.cumsum(jnp.pad(x, ((1, 0), (0, 0))), axis=0)
        x = c[k:] - c[:-k]
        c = jnp.cumsum(jnp.pad(x, ((0, 0), (1, 0))), axis=1)
        return (c[:, k:] - c[:, :-k]) / (k * k)

    ua, ub = ufilt(a), ufilt(b)
    n = k * k
    cov_norm = n / (n - 1)
    vara = cov_norm * (ufilt(a * a) - ua * ua)
    varb = cov_norm * (ufilt(b * b) - ub * ub)
    covab = cov_norm * (ufilt(a * b) - ua * ub)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    ssim_map = ((2 * ua * ub + C1) * (2 * covab + C2)) / (
        (ua * ua + ub * ub + C1) * (vara + varb + C2))
    return jnp.mean(ssim_map)


def shannon_entropy(image, base=2):
    """skimage.measure.shannon_entropy (histogram over unique values is
    approximated with a 256-bin histogram of the normalised image)."""
    img = jnp.asarray(image, jnp.float64).ravel()
    lo, hi = jnp.min(img), jnp.max(img)
    hist = jnp.histogram(img, bins=256, range=(float(lo), float(hi)))[0]
    p = hist / jnp.sum(hist)
    p = jnp.where(p > 0, p, 1.0)
    return -jnp.sum(p * jnp.log(p)) / jnp.log(base)
