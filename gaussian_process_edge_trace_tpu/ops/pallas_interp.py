"""Batched per-column linear interpolation as a Pallas TPU kernel.

The curve-cost stage needs the gradient image sampled at every posterior
curve point: E columns × S curves = hundreds of thousands of lookups per
iteration. Curve x-coordinates are exactly the integer grid columns, so
the 2-D bilinear lookup degenerates to a 1-D linear interpolation down
each column — but XLA lowers the naive formulation to a giant row gather,
which is the slowest primitive on TPU (it dominated the iteration profile
at the demo shapes).

This kernel reformulates each column's interpolation as a hat-function
one-hot contraction executed entirely in VMEM:

    out[e, s] = Σ_m  max(0, 1 − |clip(y[e,s]) − m|) · col[e, m]

One grid program per column: build the (S, M) hat matrix with a
broadcasted iota (VPU), contract against the column's M pixel values on
the MXU, never touching HBM for the intermediate. Identical result to
``bilinear_interp`` with integer column coordinates (hat weights at
``floor(y)`` / ``floor(y)+1`` are exactly ``1−frac`` / ``frac``; the clip
reproduces the spline's boundary clamp, gpet.py:122-125 semantics).

On non-TPU backends (CPU tests) the plain gather formulation is used —
gathers are cheap there and Pallas interpret mode is not.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


_BLK = 8        # columns per grid program (min sublane tile for f32)
_S_BLK = 2048   # samples per grid program (bounds the VMEM hat matrix)


def _interp_kernel(col_ref, y_ref, out_ref, *, add_const=0.0):
    # col_ref: (BLK, M) pixel columns; y_ref/out_ref: (BLK, S_blk).
    M = col_ref.shape[1]
    S = y_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, M), 1).astype(jnp.float32)
    for j in range(_BLK):  # static unroll; hat stays VMEM-resident
        y = jnp.clip(y_ref[j, :], 0.0, M - 1.0)            # (S,)
        hat = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - rows))  # (S, M)
        # Pure-VPU multiply+reduce: the hat row has <=2 nonzeros, so the
        # f32 lane reduction adds exact zeros and equals the bilinear
        # formula exactly. A (S, M) @ (M, 1) HIGHEST matvec here wasted
        # the MXU (N=1) and measured ~7x slower in-program.
        res = jnp.sum(hat * col_ref[j, :][None, :], axis=1)
        out_ref[j, :] = res + add_const if add_const else res


@functools.partial(jax.jit, static_argnames=("add_const",))
def _column_interp_pallas(cols, ys, add_const=0.0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, M = cols.shape
    _, S = ys.shape
    E_pad = ((E + _BLK - 1) // _BLK) * _BLK
    s_blk = min(S, _S_BLK)
    S_pad = ((S + s_blk - 1) // s_blk) * s_blk
    cols = jnp.pad(cols.astype(jnp.float32), ((0, E_pad - E), (0, 0)))
    ys = jnp.pad(ys.astype(jnp.float32),
                 ((0, E_pad - E), (0, S_pad - S)))
    out = pl.pallas_call(
        functools.partial(_interp_kernel, add_const=add_const),
        grid=(E_pad // _BLK, S_pad // s_blk),
        in_specs=[
            pl.BlockSpec((_BLK, M), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLK, s_blk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLK, s_blk), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E_pad, S_pad), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(cols, ys)
    return out[:E, :S]


def _H_for(M: int) -> int:
    """Two-level inner block size (hi = i0 // H, lo = i0 - H*hi), per M.

    L = ceil(M/H) is the block select's MXU contraction dim — pick H so
    L lands on ~128 lanes. Swept on v5e at (E,M,S)=(500,500,1000):
    H=4 (L=125) → 39.3 us/call, H=8 → 39.8, H=16 → 54.0. At M=1000 the
    optimum shifts exactly one octave: H=8 (L=125) beats H=4 (L=250) by
    6.6% of the whole S=10⁵ trace and H=16 (L=63) loses again. Output
    values are bitwise-identical across H (the one-hot/hat sums only
    ever add exact zeros in a different pattern; pinned by tests)."""
    return max(4, 1 << max(0, (M - 1).bit_length() - 7))


def _split3_bf16(c):
    """Exact 3-way bf16 split: ``h1 + h2 + h3 == c`` bitwise (f32).

    Each round-to-nearest bf16 component removes >= 8 mantissa bits and
    each residual subtraction is exact (the operands agree in their
    leading bits), so three components cover the full 24-bit f32
    mantissa (r2 retains <= 8 significant bits and converts exactly).
    Lets a matmul whose OTHER operand is exactly bf16-representable (a
    0/1 one-hot) run as 3 single-pass bf16 MXU products instead of
    Precision.HIGHEST's 6 — same bits out.

    The rounding MUST be ``lax.reduce_precision`` (an op XLA is required
    to preserve), not an ``astype`` round trip: under jit the algebraic
    simplifier folds ``convert_f32(convert_bf16(x)) -> x`` (excess-
    precision elision), which silently zeroes the residuals and degrades
    the select to one bf16 pass (observed in-program: 2e-3 error).
    """
    h1 = jax.lax.reduce_precision(c, exponent_bits=8, mantissa_bits=7)
    r1 = c - h1
    h2 = jax.lax.reduce_precision(r1, exponent_bits=8, mantissa_bits=7)
    r2 = r1 - h2
    return (h1.astype(jnp.bfloat16), h2.astype(jnp.bfloat16),
            r2.astype(jnp.bfloat16))


def _interp_kernel_2l(col6_ref, y_ref, out_ref, *, H, M, add_const=0.0):
    # col6_ref: (BLK, 3*(H+1), L) bf16 — the overlapped row blocks'
    # three exact bf16 split components stacked along the tap axis;
    # y/out: (BLK, S). Two-level decomposition: a (L, S) one-hot selects
    # each sample's (H+1)-row block, then an (H+1)-tap hat
    # interpolates inside it — far fewer elementwise ops than the direct
    # (S, M) hat at M=500. The block select runs as ONE fused
    # (3*(H+1), L) @ (L, S) DEFAULT-precision bf16 MXU dot over the
    # stacked splits, re-summed
    # to f32 taps: every product against the 0/1 one-hot is exact and
    # h1+h2+h3 == c2 bitwise, so the result is bitwise-identical to the
    # HIGHEST-precision f32 dot it replaces at half the MXU passes
    # (device-profiled 20-call chains on v5e at H=16: HIGHEST 0.105 →
    # split 0.052 ms/call; the H=4 retune brings it to 0.039; the
    # unsplit VPU multiply+reduce was 0.222). ylo = y - H*hi is exact
    # in f32 and every reduction adds exact zeros; the CPU interpreter's
    # FMA groupings can differ by 1 ulp at block boundaries (tests
    # assert ulp agreement).
    L = col6_ref.shape[2]
    S = y_ref.shape[1]
    T = H + 1
    hs = jax.lax.broadcasted_iota(jnp.int32, (L, S), 0)
    ts = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0).astype(
        jnp.float32)
    for j in range(_BLK):
        # Clamp to the TRUE domain in-kernel (M <= L*H by construction):
        # a host-side pre-clip pass materialised a full (E, S) copy —
        # 21 ms/trace of the 1000x1000 S=1e5 device profile.
        y = jnp.clip(y_ref[j, :], 0.0, M - 1.0)
        hi = jnp.floor(y).astype(jnp.int32) // H
        ylo = y - (hi * H).astype(jnp.float32)            # exact
        onehot = (hs == hi[None, :]).astype(jnp.bfloat16)  # (L, S)
        big = jax.lax.dot_general(
            col6_ref[j], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)          # (3T, S)
        tmp = (big[:T] + big[T:2 * T]) + big[2 * T:]      # == c2 select
        hat = jnp.maximum(0.0, 1.0 - jnp.abs(ylo[None, :] - ts))
        res = jnp.sum(hat * tmp, axis=0)
        out_ref[j, :] = res + add_const if add_const else res


@functools.partial(jax.jit, static_argnames=("add_const",))
def _column_interp_pallas_2l(cols, ys, add_const=0.0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, M = cols.shape
    _, S = ys.shape
    H = _H_for(M)
    L = (M + H - 1) // H
    Mp = L * H + 1                      # +1 row of overlap padding
    E_pad = ((E + _BLK - 1) // _BLK) * _BLK
    colsp = jnp.pad(cols.astype(jnp.float32),
                    ((0, E_pad - E), (0, Mp - M)))
    # col2d[e, t, h] = colsp[e, h*H + t] (overlapped so i0+1 never
    # crosses a block boundary); loop-invariant, built once per call.
    col2d = jnp.stack([colsp[:, t:t + (L - 1) * H + 1:H]
                       for t in range(H + 1)], axis=1)    # (E_pad, T, L)
    # Exact bf16 splits stacked on the tap axis (kernel docstring); built
    # outside the kernel so XLA hoists them out of the trace while-loop.
    col6 = jnp.concatenate(_split3_bf16(col2d), axis=1)   # (E_pad, 3T, L)
    # Block the sample axis: the kernel's (T, L, s_blk) mul-reduce
    # intermediate must stay inside VMEM (unblocked it blows up at
    # S=10⁴).
    # Floor the BUDGET to lanes, then take S whole if it fits — the demo
    # S=1000 must stay a single exact-width block. S need NOT be a
    # multiple of s_blk: Mosaic masks the edge block's loads/stores
    # (every lane is independent here — the dot contracts over L, not
    # S), which avoids materialising a padded copy of ys and the unpad
    # slice of the output (2×21 ms/trace at 1000×1000 S=10⁵).
    budget = max(128, ((1 << 22) // (4 * (H + 1) * L) // 128) * 128)
    s_blk = min(S, budget)
    ysp = ys.astype(jnp.float32)
    if E_pad != E:
        ysp = jnp.pad(ysp, ((0, E_pad - E), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_interp_kernel_2l, H=H, M=M,
                          add_const=add_const),
        grid=(E_pad // _BLK, (S + s_blk - 1) // s_blk),
        in_specs=[
            pl.BlockSpec((_BLK, 3 * (H + 1), L), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLK, s_blk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLK, s_blk), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E_pad, S), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(col6, ysp)
    return out[:E] if E_pad != E else out


@functools.partial(jax.jit, static_argnames=("add_const",))
def _column_interp_gather(cols, ys, add_const=0.0):
    E, M = cols.shape
    y = jnp.clip(ys, 0, M - 1)
    r0 = jnp.clip(jnp.floor(y), 0, M - 2).astype(jnp.int32)
    fr = (y - r0).astype(cols.dtype)
    v0 = jnp.take_along_axis(cols, r0, axis=1)
    v1 = jnp.take_along_axis(cols, r0 + 1, axis=1)
    res = v0 + fr * (v1 - v0)
    return res + add_const if add_const else res


def column_interp(cols, ys, two_level=True, add_const=0.0):
    """Linear interpolation of ``cols[e, :]`` at rows ``ys[e, :]``.

    Args:
      cols: (E, M) per-column pixel values (i.e. ``grad_img.T`` rows).
      ys: (E, S) real-valued row coordinates (clamped to [0, M-1]).
      two_level: on TPU, use the two-level VPU kernel (bitwise-identical
        to the direct hat kernel; fewer elementwise ops at M >= ~64).
      add_const: static scalar added to every output in the kernel
        epilogue — the same f32 add the caller would issue, but fused:
        a separate ``+ c`` over the (E, S) result is a full extra
        read+write pass of the largest array in the trace loop
        (23 ms of the 1000², S=10⁵ device profile for the curve cost's
        ``+ kde_thresh`` floor, gpet.py:392).

    Returns:
      (E, S) interpolated values, float32 on TPU / input dtype elsewhere.
    """
    add_const = float(add_const)
    if jax.default_backend() == "tpu":
        if two_level and cols.shape[1] >= 4 * _H_for(cols.shape[1]):
            return _column_interp_pallas_2l(
                cols, ys, add_const=add_const).astype(ys.dtype)
        return _column_interp_pallas(
            cols, ys, add_const=add_const).astype(ys.dtype)
    return _column_interp_gather(cols, ys, add_const)
