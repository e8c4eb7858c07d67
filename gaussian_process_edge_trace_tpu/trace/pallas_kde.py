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


def _hb_for(M: int) -> int:
    """Tap-block size for the two-level adjoint binning.

    NB = M//Hb + 1 is the one-hot MXU contraction's output row count and
    3·(Hb+1) its output lane count — pick Hb so NB lands near 64 rows
    (one sublane tile at f32) while 3·(Hb+1) stays within one 128-lane
    tile: M=500 → Hb=8 (NB=63), M=1000 → 16 (63), M=2000 → 32 (63)."""
    return min(32, max(8, 1 << max(0, M.bit_length() - 6)))


_BLK2L = 8   # columns per 2l grid program (each is a static unrolled MXU dot)
# Sample chunk per program (VMEM ~(NB + 4·Tt)·s_blk·4 B ≈ 6.5 MB at the
# cap). Swept on v5e at (E,S,M)=(1000,10⁴,1000): 1024 → 2.12 ms,
# 2048 → 1.94, 4096 → 2.19, 8192 → 2.79, 16384 (single chunk) → 1.74 —
# one unchunked pass avoids the revisited-accumulator grid entirely.
_S_BLK2L = 16384


def _trunc_bf16(x):
    """Truncate f32 to its top 8 mantissa bits (exactly bf16-representable)
    by masking — round-toward-zero, so ``x - _trunc_bf16(x)`` is exact."""
    xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(xi & jnp.uint32(0xFFFF0000),
                                        jnp.float32)


def _binning_2l_kernel(y_ref, w_ref, out_ref, *, Hb, M, NB, S):
    """Two-level ADJOINT of the interp decomposition (VERDICT r4 item 1c):
    instead of evaluating the tent at all M+2 grid rows per sample (the
    dense hat), each sample's two-tap mass w·(1−f) / w·f is placed in a
    compact (Hb+1)-tap column at offset r = lo − b·Hb inside its row
    block b = lo//Hb (VPU compares over Hb+1+NB rows instead of M+2),
    and the block-level accumulation C[b, j] = Σ_s 1[b==b_s]·T_s[j] runs
    on the MXU as a (NB, S_blk) × (S_blk, 3(Hb+1)) one-hot contraction.
    The one-hot is exactly bf16; the taps are split into 3 exact bf16
    components in-kernel (ops/pallas_interp._split3_bf16 rationale), so
    the 3 DEFAULT-precision passes reproduce the f32 products bitwise —
    only the Σ_s accumulation order differs from the dense hat.

    Per-term arithmetic matches _binning_kernel / the XLA dense block
    exactly: f = yp − floor(yp) and the products w·(1−f), w·f are the
    same f32 expressions the tent max(0, 1−|yp−m|)·w evaluates at the
    two surviving rows."""
    from jax.experimental import pallas as pl

    k = pl.program_id(1)
    s_blk = y_ref.shape[1]
    Tt = Hb + 1
    bs = jax.lax.broadcasted_iota(jnp.int32, (NB, s_blk), 0)
    ts = jax.lax.broadcasted_iota(jnp.int32, (Tt, s_blk), 0)
    # Mask samples beyond S (the edge S chunk): the dot CONTRACTS over
    # the sample lanes, so garbage lanes would contribute — zero their
    # weight by global sample index.
    sid = k * s_blk + jax.lax.broadcasted_iota(jnp.int32, (1, s_blk), 1)
    in_range = (sid < S)[0]
    w_all = jnp.where(in_range, w_ref[0, :], 0.0)

    rows = []
    for j in range(out_ref.shape[0]):                    # static _BLK
        # Replace out-of-range lanes (masked-load garbage can be NaN,
        # and 0·NaN = NaN would poison the zero-weight product) with
        # the out-of-image sentinel before any arithmetic.
        y = jnp.where(in_range, y_ref[j, :], -10.0)
        valid = (y >= 0.0) & (y <= M - 1.0)              # gpet.py:498-500
        wv = jnp.where(valid, w_all, 0.0)
        yp = jnp.clip(y, -1.0, float(M)) + 1.0           # rows 0..M+1
        lo = jnp.floor(yp)
        f = yp - lo                                      # exact f32
        lo_i = lo.astype(jnp.int32)
        b = lo_i // Hb
        r = lo_i - b * Hb                                # 0..Hb-1
        w1 = wv * (1.0 - f)
        w2 = wv * f
        taps = (jnp.where(ts == r[None, :], w1[None, :], 0.0)
                + jnp.where(ts == r[None, :] + 1, w2[None, :], 0.0))
        # In-kernel exact 3-way bf16 split. Mosaic has no
        # reduce_precision lowering, so use bit-mask TRUNCATION instead
        # of round-to-nearest: masking the low 16 mantissa bits leaves a
        # value exactly representable in bf16, each residual subtraction
        # is exact (operands agree in their leading bits), and three
        # 8-bit components cover the 24-bit f32 mantissa. Unlike an
        # astype round trip there is nothing a simplifier can elide.
        h1 = _trunc_bf16(taps)
        r1 = taps - h1
        h2 = _trunc_bf16(r1)
        t6 = jnp.concatenate(
            [h1.astype(jnp.bfloat16), h2.astype(jnp.bfloat16),
             (r1 - h2).astype(jnp.bfloat16)], axis=0)    # (3Tt, s_blk)
        onehot = (bs == b[None, :]).astype(jnp.bfloat16)  # (NB, s_blk)
        big = jax.lax.dot_general(
            onehot, t6, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)          # (NB, 3Tt)
        rows.append((big[:, :Tt] + big[:, Tt:2 * Tt]) + big[:, 2 * Tt:])
    acc = jnp.stack(rows, axis=0)

    @pl.when(k == 0)
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    out_ref[...] += acc


@functools.partial(jax.jit, static_argnames=("M",))
def _binning_2l(y_curves, weights, M: int):
    """Two-level adjoint binning: returns (M+2, E) f32, same contract as
    :func:`_binning_dense_chunked` up to f32 sum-order."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, S = y_curves.shape
    Hb = _hb_for(M)
    NB = M // Hb + 1
    Tt = Hb + 1
    E_pad = ((E + _BLK2L - 1) // _BLK2L) * _BLK2L
    ys = jnp.pad(y_curves.astype(jnp.float32),
                 ((0, E_pad - E), (0, 0)),
                 constant_values=-10.0)  # padded rows: out-of-image => 0
    w = weights.astype(jnp.float32)[None, :]
    # Sample chunk: bounds the (NB + 4·Tt, s_blk) VMEM intermediates.
    s_blk = min(S, _S_BLK2L)
    n_sblk = (S + s_blk - 1) // s_blk
    C = pl.pallas_call(
        functools.partial(_binning_2l_kernel, Hb=Hb, M=M, NB=NB, S=S),
        grid=(E_pad // _BLK2L, n_sblk),
        in_specs=[
            pl.BlockSpec((_BLK2L, s_blk), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLK2L, NB, Tt), lambda i, k: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E_pad, NB, Tt), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(ys, w)
    # Unfold compact (NB, Hb+1) tap blocks to the (M+2,) grid column:
    # block b's taps 0..Hb-1 land at rows b·Hb+j; tap Hb (the straddle)
    # lands at row (b+1)·Hb — fold it into the next block's j=0 row.
    main = C[:, :, :Hb].reshape(E_pad, NB * Hb)
    stra = C[:, :, Hb]                                   # (E_pad, NB)
    inter = jnp.concatenate(
        [jnp.pad(stra[:, :-1], ((0, 0), (1, 0)))[:, :, None],
         jnp.zeros((E_pad, NB, Hb - 1), jnp.float32)],
        axis=2).reshape(E_pad, NB * Hb)
    full = jnp.concatenate([main + inter, stra[:, -1:]], axis=1)
    return full[:E, :M + 2].T                            # (M+2, E)


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
    if jax.default_backend() == "tpu":
        if use_pallas:
            return _binning_pallas(y_curves, weights, M).astype(
                y_curves.dtype)
        if y_curves.shape[1] >= _2L_MIN_S:
            return _binning_2l(y_curves, weights, M).astype(y_curves.dtype)
    return _binning_dense_chunked(y_curves, weights, M)


# Kept-curve count above which the two-level adjoint kernel replaces the
# dense hat (device-profiled crossover on v5e, r5: at S=100 the dense
# fusion wins at every M (0.031 vs 0.084 ms at M=500); at S=400 the 2l
# kernel wins at every M (1.55-2.60x); from S=1000 it wins 4-12x).
_2L_MIN_S = 256


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

    # Seed the scan carry from the FIRST chunk instead of jnp.zeros: under
    # shard_map (check_vma=True) a literal-zeros carry is sample-invariant
    # typed while the chunk contributions are varying-typed, which rejects
    # the scan on any mesh (caught by the non-toy dryrun_multichip case).
    # Identical f32 arithmetic: 0 + block == block exactly.
    ycs = jnp.moveaxis(yb, 1, 0)
    H0 = block(ycs[0], wb[0])
    H, _ = jax.lax.scan(body, H0, (ycs[1:], wb[1:]))
    return H
