"""Finite differencing (reference C8, gpet.py:336-367).

The reference's explicit Python loop becomes a slice subtraction with the
same index arithmetic: ``typ`` 0 = forward, 1 = backward, 2 = central;
``h`` is the step size. Only ``typ=0, h=1`` is used by the cost function
(gpet.py:400), but the full surface is kept for parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def finite_diff(y, typ=0, h=1):
    """Approximate derivative of ``y`` sampled at unit-spaced points.

    Mirrors gpet.py:359-366: for ``typ`` in {0, 1, 2}, index bounds
    (lower, upper) = [(0, N-1), (1, N), (1, N-1)] and offsets
    (b, a) = [(h, 0), (0, -h), (-h, h)]; ``diff[i-lower] = y[i+b]-y[i+a]``.
    Returns an array of length ``upper - lower``.
    """
    y = jnp.asarray(y)
    n = y.shape[0]
    lower, upper = [(0, n - 1), (1, n), (1, n - 1)][typ]
    b, a = [(h, 0), (0, -h), (-h, h)][typ]
    idx = jnp.arange(lower, upper)
    return y[idx + b] - y[idx + a]
