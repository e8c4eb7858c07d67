"""Dual-mode kernel-density estimate on the pixel grid.

TPU-native replacement for ``KDEpy.FFTKDE(kernel='gaussian', bw=1)``
(reference: gpet.py:455-529). FFTKDE's algorithm is *linear binning* of the
weighted sample points onto the evaluation grid followed by convolution
with the Gaussian kernel sampled on that grid. We reproduce exactly that
discretisation — without the FFT, since the kernel support is tiny (the
Gaussian at bw=1 is < 1e-14 of its peak beyond 8 px) and XLA convolutions
of small separable filters are faster than FFTs at these sizes.

Grid semantics follow the reference exactly (gpet.py:515-527): the KDE is
evaluated on the integer grid ``[-1, N] x [-1, M]`` (one-pixel pad on every
side), cropped back to ``(M, N)``, then min-max normalised to [0, 1]. The
min-max normalisation makes every global scale factor (KDEpy's density
normalisation) irrelevant, so only the *shape* must match — which binning +
discrete convolution gives bit-consistently.

Two modes:

- :func:`curve_kde` — posterior-curve mode (gpet.py:485-500): sample points
  are the best-curve pixels, each weighted by the normalised inverse cost
  of its curve; points with y outside [0, M-1] are dropped (weight 0 here —
  deletion and zero-weighting are identical under linear binning).
  Curve x-coordinates are exactly the integer grid columns, so binning in x
  is exact and the 2-D linear binning reduces to a per-column 1-D binning —
  a dense hat-function contraction the VPU executes in one fused reduce.
- :func:`gradient_kde` — image-gradient mode (gpet.py:503-509): sample
  points are the integer pixels with gradient above ``kde_thresh``,
  weighted by their intensity; integer points bin to a single node, so
  binning is just a masked copy of the gradient image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Gaussian truncation radius, in pixels (bw = 1). exp(-0.5 * 8^2) ~ 1.3e-14
# relative to the peak: far below every threshold in the pipeline, so the
# truncated convolution is numerically identical to KDEpy's full FFT.
DEFAULT_RADIUS = 8


def gaussian_taps(radius: int, bw: float = 1.0, dtype=jnp.float32):
    """Discrete Gaussian samples exp(-t^2 / (2 bw^2)) on [-radius, radius].

    Unnormalised — the reference min-max normalises the KDE (gpet.py:527)
    so constant factors cancel.
    """
    t = jnp.arange(-radius, radius + 1, dtype=dtype)
    return jnp.exp(-0.5 * (t / bw) ** 2)


def _separable_blur(grid, taps):
    """2-D convolution with the separable kernel ``taps ⊗ taps``.

    Zero ('SAME') boundary — FFTKDE's linear convolution sees zeros beyond
    the evaluation grid too.
    """
    k = taps.shape[0]
    img = grid[None, None, :, :]
    ky = taps.reshape(1, 1, k, 1)
    kx = taps.reshape(1, 1, 1, k)
    dn = ("NCHW", "OIHW", "NCHW")
    out = jax.lax.conv_general_dilated(
        img, ky.astype(grid.dtype), (1, 1),
        [(k // 2, k // 2), (0, 0)], dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST)
    out = jax.lax.conv_general_dilated(
        out, kx.astype(grid.dtype), (1, 1),
        [(0, 0), (k // 2, k // 2)], dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST)
    return out[0, 0]


def _minmax(grid):
    lo = jnp.min(grid)
    hi = jnp.max(grid)
    return (grid - lo) / (hi - lo)


def curve_kde_raw(y_curves, weights, M: int, N: int, x_start: int,
                  radius: int = DEFAULT_RADIUS, bw: float = 1.0):
    """Un-normalised curve KDE (binning + blur + crop, no min-max).

    The building block for sample-axis sharding: the blurred grid is
    additive over curves, so per-device partial grids can be ``psum``-med
    over the sample mesh axis before the global min-max normalisation.
    """
    E, S = y_curves.shape
    dtype = y_curves.dtype
    yp = y_curves + 1.0  # padded-grid row coordinate (pad offset +1)

    # Zero-weight the out-of-image points (deletion at gpet.py:498-500).
    w = jnp.broadcast_to(weights[None, :], (E, S))
    w = jnp.where((y_curves >= 0) & (y_curves <= M - 1), w, 0.0)

    # Per-column linear binning: hat-function contraction over samples.
    # H[m, e] = sum_s w[e, s] * max(0, 1 - |yp[e, s] - m|), m in [0, M+2).
    rows = jnp.arange(M + 2, dtype=dtype)
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(yp[None, :, :] - rows[:, None, None]))
    H = jnp.sum(hat * w[None, :, :], axis=-1)  # (M+2, E)

    # Place the E columns at padded-grid columns x_start+1 .. x_start+E.
    grid = jnp.zeros((M + 2, N + 2), dtype=dtype)
    grid = jax.lax.dynamic_update_slice(grid, H, (0, x_start + 1))

    taps = gaussian_taps(radius, bw, dtype)
    blurred = _separable_blur(grid, taps)
    return blurred[1:-1, 1:-1]


@functools.partial(jax.jit, static_argnames=("M", "N", "x_start", "radius"))
def curve_kde(y_curves, weights, M: int, N: int, x_start: int,
              radius: int = DEFAULT_RADIUS, bw: float = 1.0):
    """KDE of the best posterior curves on the (M, N) pixel grid.

    Args:
      y_curves: (E, S) y-values of the S best curves at the E grid columns
        ``x_start .. x_start+E-1``.
      weights: (S,) per-curve weights (normalised inverse costs,
        gpet.py:492-493 — normalisation is irrelevant under min-max).
      M, N: image shape. x_start: first grid column.

    Returns:
      (M, N) KDE, min-max normalised to [0, 1].
    """
    return _minmax(curve_kde_raw(y_curves, weights, M, N, x_start,
                                 radius, bw))


def kde_normalise(raw):
    """Min-max normalise a (psum-reduced) raw KDE grid (gpet.py:527)."""
    return _minmax(raw)


@functools.partial(jax.jit, static_argnames=("radius",))
def gradient_kde(grad_img, kde_thresh: float = 1e-3,
                 radius: int = DEFAULT_RADIUS, bw: float = 1.0):
    """KDE of the gradient image (init-time mode, gpet.py:503-509).

    Sample points are the integer pixels with ``grad > kde_thresh``,
    weighted by intensity; binning of integer points is a masked copy.
    """
    M, N = grad_img.shape
    masked = jnp.where(grad_img > kde_thresh, grad_img, 0.0)
    grid = jnp.pad(masked, 1)
    taps = gaussian_taps(radius, bw, grad_img.dtype)
    blurred = _separable_blur(grid, taps)
    return _minmax(blurred[1:-1, 1:-1])
