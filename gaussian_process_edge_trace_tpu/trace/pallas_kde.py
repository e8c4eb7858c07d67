"""Per-column KDE linear binning as a Pallas TPU kernel.

The curve-KDE binning (trace/kde.py) is a hat-function contraction

    H[m, e] = Σ_s w[e, s] · max(0, 1 − |(y[e, s] + 1) − m|)

over the kept curves. The XLA formulation materialises the (M+2, E, S)
hat tensor through HBM (~100 MB at demo shapes — it dominated the
iteration profile); here each grid program builds the (M+2, S) hat for a
block of columns entirely in VMEM and contracts it against the weight
vector on the MXU, writing only the (M+2,)-column result.

The out-of-image deletion rule (weight 0 for y outside [0, M-1],
gpet.py:498-500) is folded into the per-point weights in-kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BLK = 32


def _binning_kernel(y_ref, w_ref, out_ref):
    # y_ref: (BLK, S) curve rows for these columns; w_ref: (1, S) per-curve
    # weights; out_ref: (BLK, Mp2) binned mass (padded-grid rows).
    S = y_ref.shape[1]
    Mp2 = out_ref.shape[1]
    M = Mp2 - 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (Mp2, S), 0).astype(
        jnp.float32)
    w = w_ref[0, :]
    for j in range(_BLK):
        y = y_ref[j, :]
        valid = (y >= 0.0) & (y <= M - 1.0)               # gpet.py:498-500
        wv = jnp.where(valid, w, 0.0)                     # (S,)
        hat = jnp.maximum(0.0, 1.0 - jnp.abs((y + 1.0)[None, :] - rows))
        out_ref[j, :] = jax.lax.dot_general(
            hat, wv[:, None],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)[:, 0]


import functools


@functools.partial(jax.jit, static_argnames=("M",))
def _binning_pallas(y_curves, weights, M: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, S = y_curves.shape
    E_pad = ((E + _BLK - 1) // _BLK) * _BLK
    ys = jnp.pad(y_curves.astype(jnp.float32),
                 ((0, E_pad - E), (0, 0)),
                 constant_values=-10.0)  # padded rows: out-of-image => 0
    w = weights.astype(jnp.float32)[None, :]
    out = pl.pallas_call(
        _binning_kernel,
        grid=(E_pad // _BLK,),
        in_specs=[
            pl.BlockSpec((_BLK, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLK, M + 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E_pad, M + 2), jnp.float32),
    )(ys, w)
    return out[:E].T  # (M+2, E)


def column_binning(y_curves, weights, M: int, use_pallas: bool = False):
    """Binned column masses H (M+2, E) for the curve KDE.

    ``use_pallas=False`` by default: at the demo shapes (E=500, S=100,
    M=500) XLA's fused hat contraction measured *faster in-program* than
    this kernel (303 ms vs 313-320 ms full-trace) — the per-column GEMV
    underutilises the MXU and the grid sequencing costs more than the
    HBM traffic it saves. Kept for larger S (BASELINE config 4, N_samples
    → 10⁵) where the dense (M, E, S) contraction stops fitting."""
    if use_pallas and jax.default_backend() == "tpu":
        return _binning_pallas(y_curves, weights, M).astype(y_curves.dtype)
    return _binning_dense_chunked(y_curves, weights, M)


# Target size for one hat-contraction block: (M+2)·E·chunk elements.
# Larger sample counts (BASELINE config 4, N_samples → 10⁵) are scanned
# in chunks of this size instead of materialising a multi-GB tensor.
# Swept on v5e at 1000×1000 S=10⁵ whole-trace: 32M → 735.6 ms,
# 128M → 728.9, 512M → 790.0; the demo shapes (25M elements) stay a
# single unchunked block at any of these.
_CHUNK_ELEMS = 128 * 1024 * 1024


def _binning_dense_chunked(y_curves, weights, M: int):
    E, S = y_curves.shape
    dtype = y_curves.dtype
    rows = jnp.arange(M + 2, dtype=dtype)

    def block(yb, wb):
        yp = yb + 1.0
        w = jnp.broadcast_to(wb[None, :], yb.shape)
        w = jnp.where((yb >= 0) & (yb <= M - 1), w, 0.0)
        hat = jnp.maximum(0.0, 1.0 - jnp.abs(yp[None, :, :]
                                             - rows[:, None, None]))
        return jnp.sum(hat * w[None, :, :], axis=-1)      # (M+2, E)

    chunk = max(1, _CHUNK_ELEMS // ((M + 2) * E))
    if S <= chunk:
        return block(y_curves, weights)
    n_chunks = -(-S // chunk)
    pad = n_chunks * chunk - S
    # Padded samples carry zero weight, contributing nothing.
    yb = jnp.pad(y_curves, ((0, 0), (0, pad)))
    wb = jnp.pad(weights, (0, pad))
    yb = yb.reshape(E, n_chunks, chunk)
    wb = wb.reshape(n_chunks, chunk)

    def body(carry, inp):
        yc, wc = inp
        return carry + block(yc, wc), None

    H0 = jnp.zeros((M + 2, E), dtype)
    H, _ = jax.lax.scan(body, H0, (jnp.moveaxis(yb, 1, 0), wb))
    return H
