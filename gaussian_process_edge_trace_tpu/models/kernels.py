"""GP covariance functions (RBF, Matérn ν∈{1.5, 2.5}, constant scaling,
heteroscedastic diagonal noise).

Replaces the reference's sklearn kernel objects (composed at
gpet.py:165-178) and the vendored ``WeightedWhiteKernel``
(sklearn_gpr.py:617-721). Design deltas (SURVEY.md §7 step 2):

- kernels are pure functions of 1-D inputs — the tracer's inputs are pixel
  columns, so grams are built from pairwise |xi - xj| directly;
- the noise kernel's train/query inference-by-shape hack
  (sklearn_gpr.py:672-677) is gone: noise enters only the training Gram
  diagonal, passed explicitly;
- padded (masked) observations are supported everywhere: masked rows/cols
  produce an identity block that decouples exactly under Cholesky.

Only the two Matérn orders the reference instantiates (gpet.py:134,143)
are implemented, via their closed forms — no Bessel functions needed.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

SQRT3 = math.sqrt(3.0)
SQRT5 = math.sqrt(5.0)


class KernelSpec(NamedTuple):
    """Static kernel configuration (hashable; safe as a jit static arg)."""
    kind: str          # "RBF" or "Matern"
    nu: float = 2.5    # only used for Matern; 1.5 or 2.5


def k_unit(spec: KernelSpec, d):
    """Unit-variance stationary kernel value at (scaled) distance ``d``.

    ``d`` is |x - x'| / length_scale, elementwise.
    """
    if spec.kind == "RBF":
        return jnp.exp(-0.5 * d * d)
    if spec.kind == "Matern":
        if spec.nu == 1.5:
            s = SQRT3 * d
            return (1.0 + s) * jnp.exp(-s)
        if spec.nu == 2.5:
            s = SQRT5 * d
            return (1.0 + s + s * s / 3.0) * jnp.exp(-s)
        raise NotImplementedError(
            f"Matern nu={spec.nu} (reference only uses 1.5/2.5, gpet.py:143)")
    raise NotImplementedError(spec.kind)


def dk_unit_dlog_ls(spec: KernelSpec, d):
    """∂k_unit/∂log ℓ expressed through the scaled distance d = r/ℓ.

    Used by the analytic LML gradient (sklearn_gpr.py:548-580 semantics,
    without autodiff — the batched Pallas-Cholesky fit path cannot be
    differentiated through). d(d)/d(log ℓ) = −d, so this is −d·k'(d).
    """
    if spec.kind == "RBF":
        return d * d * jnp.exp(-0.5 * d * d)
    if spec.kind == "Matern":
        if spec.nu == 1.5:
            s = SQRT3 * d
            return s * s * jnp.exp(-s)
        if spec.nu == 2.5:
            s = SQRT5 * d
            return (s * s / 3.0) * (1.0 + s) * jnp.exp(-s)
        raise NotImplementedError(spec.nu)
    raise NotImplementedError(spec.kind)


def k_unit_np(spec: KernelSpec, d):
    """NumPy mirror of :func:`k_unit` for host-side precomputation."""
    import numpy as np
    if spec.kind == "RBF":
        return np.exp(-0.5 * d * d)
    s = (SQRT5 if spec.nu == 2.5 else SQRT3) * d
    if spec.nu == 2.5:
        return (1.0 + s + s * s / 3.0) * np.exp(-s)
    return (1.0 + s) * np.exp(-s)


def cross_gram(spec: KernelSpec, x1, x2, length_scale, variance=1.0):
    """K[i, j] = variance * k_unit(|x1[i] - x2[j]| / length_scale).

    ``x1``/``x2`` are 1-D coordinate vectors (pixel columns).
    """
    d = jnp.abs(x1[:, None] - x2[None, :]) / length_scale
    return variance * k_unit(spec, d)


def train_gram(spec: KernelSpec, x, length_scale, variance,
               diag_noise, mask=None, pad_diag=1.0):
    """Training Gram: variance * k_unit + diag(diag_noise), mask-aware.

    ``diag_noise`` is the full per-point diagonal (heteroscedastic
    observation noise + jitter) — the explicit replacement for
    ``WeightedWhiteKernel`` plus the GPR ``alpha`` term
    (sklearn_gpr.py:304-305,684).

    With ``mask`` (True = valid observation), rows/columns of padded
    entries are zeroed and their diagonal set to ``pad_diag`` so the Gram
    is block-diagonal ``[[K_valid, 0], [0, pad_diag·I]]``; its Cholesky
    factors the valid block exactly and the padded block contributes
    ``0.5·log(pad_diag)`` per padded point to log|K| (cancelled or ignored
    by callers; pad_diag=1 contributes zero).
    """
    K = cross_gram(spec, x, x, length_scale, variance)
    n = x.shape[0]
    eye = jnp.eye(n, dtype=K.dtype)
    K = K + jnp.diag(diag_noise)
    if mask is not None:
        m2 = (mask[:, None] & mask[None, :])
        K = jnp.where(m2, K, 0.0) + jnp.where(
            mask[:, None], 0.0, pad_diag * eye)
    return K


def resolve_kernel_options(kernel_options, M, edge_length):
    """Resolve the reference's kernel spec (dict or 3-tuple heuristic).

    Mirrors gpet.py:130-151: dicts carry explicit hyperparameters; the
    3-tuple ``(k, s, l)`` maps small ints to image-relative scales.
    Returns ``(KernelSpec, sigma_f, length_scale)``.
    """
    if isinstance(kernel_options, dict):
        sigma_f = kernel_options["sigma_f"]
        sigma_l = kernel_options["length_scale"]
        kernel_type = kernel_options["kernel"]
        # A Matern dict without 'nu' raises KeyError exactly like the
        # reference's kernel_options['nu'] access (gpet.py:133).
        nu = kernel_options["nu"] if kernel_type == "Matern" else 2.5
    else:
        rbf_matern, sigmaf_opt, sigmal_opt = kernel_options
        kernel_type = ["RBF", "Matern"][int(rbf_matern > 0)]
        nu = [2.5, 1.5][int(rbf_matern > 1)]
        sigma_f_const = ([10, 8, 6, 4, 2, 1][sigmaf_opt - 1]
                         if 0 <= sigmaf_opt <= 5 else 1)
        sigma_f = M // sigma_f_const
        sigma_l_const = ([1, 4 / 3, 2, 4, 10][sigmal_opt - 1]
                         if 0 <= sigmal_opt <= 4 else 10)
        sigma_l = edge_length // sigma_l_const
    return KernelSpec(kind=kernel_type, nu=float(nu)), float(sigma_f), float(sigma_l)
