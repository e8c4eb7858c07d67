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
import numpy as np


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


# ---------------------------------------------------------------------------
# Fused interp + Simpson quadratures (the whole curve-cost reduction)
# ---------------------------------------------------------------------------

# Hard cap on the fused kernel's sample-block width (the arithmetic VMEM
# budget inside _fused_cost_call usually allows more; r5 A/B at 1000²,
# S=10⁵: 896 → 4096 lanes cut the grid from 14k sub-µs programs to 3.1k
# and the call from 13.2 → 4.5 ms; 8192 measured no further win while
# doubling VMEM pressure).
_FUSED_S_BLK_CAP = 4096


def _fused_cost_call(cols, ys, kde_thresh: float, with_transpose=False):
    """Curve-cost quadratures in ONE Pallas pass: per-column interpolation
    (identical arithmetic to :func:`_column_interp_pallas_2l`, including the
    ``+kde_thresh`` epilogue) PLUS both Simpson reductions of
    ``trace/scoring.py::curve_costs`` — the non-uniform line integral over
    the interpolated gradient values and the static-weight arc length —
    accumulated across column blocks in VMEM.

    The unfused pipeline materialises grad_score (E, S), the step array
    (E-1, S) and re-reads both in two reduce fusions: 45.6 + 29.6 ms of the
    1000², S=10⁵ device profile (plus the kernel's own (E, S) output write).
    Here nothing (E, S)-shaped ever reaches HBM: the kernel emits per-block
    partial sums into an (8, S) accumulator (row 0 = line integral, row 1 =
    arc length).

    Requires E even (⇒ both quadratures have an odd point count, so the
    composite pair rule applies with no even-count tail and the historical
    ``even='avg'`` rule coincides with the modern one — gpet.py:404-405
    semantics either way).

    Returns ``(line_integral (S,), arc_length (S,))``, float32 — plus a
    transposed ``(S, E_pad)`` copy of ``ys`` when ``with_transpose`` (the
    sample blocks are already in VMEM, so the kernel transposes them on
    the way through): ``best_curves``' top-K column ``take`` otherwise
    forces XLA to materialise a layout-transposed copy of the full (E, S)
    samples array — 22 ms of the 1000², S=10⁵ device profile — while a
    row take from the pre-transposed copy is the fast major-dim gather.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, M = cols.shape
    _, S = ys.shape
    assert E % 2 == 0, "fused cost kernel requires even E"
    H = _H_for(M)
    L = (M + H - 1) // H
    T = H + 1
    Mp = L * H + 1
    E_pad = ((E + _BLK - 1) // _BLK) * _BLK
    n_eblk = E_pad // _BLK

    colsp = jnp.pad(cols.astype(jnp.float32),
                    ((0, E_pad - E), (0, Mp - M)))
    col2d = jnp.stack([colsp[:, t:t + (L - 1) * H + 1:H]
                       for t in range(H + 1)], axis=1)     # (E_pad, T, L)
    col6 = jnp.concatenate(_split3_bf16(col2d), axis=1)    # (E_pad, 3T, L)

    # Sample-block width. col6 streams in (_BLK, 3T, L) blocks (54 KB at
    # M=1000 — it was fully VMEM-resident through r4, which strangled
    # s_blk to 896 and shattered the call into 14k sub-µs grid programs;
    # the per-program fixed cost, not MXU/VPU/HBM, dominated the 1000²
    # S=10⁵ profile at 222 ms/trace). Per-lane VMEM is ~1.7 KB (onehot +
    # hs iota at L rows dominate, plus the quadrature scratch), so 4096
    # lanes ≈ 7 MB — comfortably inside the 16 MB VMEM bound that the
    # arithmetic gate below enforces BEFORE compiling (a failed Mosaic
    # VMEM allocation wedges the tunneled runtime, CLAUDE.md).
    per_lane = 6 * L + 24 * T + 768
    budget = max(128, ((10 << 20) // per_lane // 128) * 128)
    s_blk = min(S, min(budget, _FUSED_S_BLK_CAP))
    n_sblk = (S + s_blk - 1) // s_blk

    # The three ys views below (previous / own / next block) use CLAMPED
    # index maps instead of a padded copy: padding would materialise a
    # full (E, S) pass in HBM — the very traffic this kernel deletes.
    # Clamp-read garbage rows only ever feed terms whose global-row masks
    # exclude them (r < 2 at the first block; r > E−4/E−3/E−2 at the
    # last — E ≤ E_pad and the pair rule never reaches past E−2).
    ysp = ys.astype(jnp.float32)
    if E_pad != E:
        ysp = jnp.pad(ysp, ((0, E_pad - E), (0, 0)))

    third = np.float32(2.0) / np.float32(6.0)   # == simpson_weights' hsum/6

    def kernel(col6_ref, yprev_ref, y_ref, ynext_ref, out_ref,
               yst_ref=None):
        i = pl.program_id(1)
        if yst_ref is not None:
            # The raw sample block is already in VMEM — emit its
            # transpose so best_curves' top-K extraction reads a fast
            # major-dim layout instead of forcing XLA's (E, S)
            # layout-transpose copy.
            yst_ref[...] = y_ref[...].T
        hs = jax.lax.broadcasted_iota(jnp.int32, (L, s_blk), 0)
        ts = jax.lax.broadcasted_iota(
            jnp.int32, (T, s_blk), 0).astype(jnp.float32)

        # steps st[k] = step[BLK·i − 1 + k] for k = 0..BLK+2, where
        # step[r] = sqrt(1 + (y[r+1] − y[r])²)  (gpet.py:397,400 on the
        # unit x grid; computed from the RAW samples like the unfused
        # path's jnp.diff).
        yext = jnp.concatenate(
            [yprev_ref[_BLK - 1:_BLK, :], y_ref[...], ynext_ref[0:3, :]],
            axis=0)
        dy = yext[1:, :] - yext[:-1, :]
        st = jnp.sqrt(1.0 + dy * dy)                       # (BLK+3, s_blk)
        s_m1 = st[0:_BLK, :]
        s_0 = st[1:_BLK + 1, :]
        s_p1 = st[2:_BLK + 2, :]
        s_p2 = st[3:_BLK + 3, :]

        # Per-row line-integral weights: scatter the 3 coefficients of the
        # non-uniform pair rule (ops/integrate.py::_pair_contributions,
        # h[p] = step[p+1]) onto the row that owns each g term. Exactly
        # the same coefficient arithmetic; only the summation grouping
        # differs (per-row instead of per-window, then sequential over
        # blocks), which moves the result by f32 rounding only.
        r = (i * _BLK + jax.lax.broadcasted_iota(
            jnp.int32, (_BLK, s_blk), 0))
        even = (r % 2) == 0
        hsum0 = s_p1 + s_p2
        c0 = (hsum0 / 6.0) * (2.0 - s_p2 / s_p1)
        hsum1 = s_0 + s_p1
        c1 = (hsum1 / 6.0) * (hsum1 * hsum1 / (s_0 * s_p1))
        hsum2 = s_m1 + s_0
        c2 = (hsum2 / 6.0) * (2.0 - s_m1 / s_0)
        zero = jnp.zeros((), jnp.float32)
        w_line = (jnp.where(even & (r <= E - 4), c0, zero)
                  + jnp.where(~even & (r <= E - 3), c1, zero)
                  + jnp.where(even & (r >= 2) & (r <= E - 2), c2, zero))

        # Arc-length weights: Simpson over the uniform unit x grid's E−1
        # leading points — bitwise the ``simpson_weights(x_grid[:-1])``
        # vector (1/3, 4/3, 2/3, ..., 4/3, 1/3 in exact f32 arithmetic).
        w_arc = jnp.where(
            (r == 0) | (r == E - 2), third,
            jnp.where(even, third + third, third * 4.0))
        w_arc = jnp.where(r <= E - 2, w_arc, zero)
        arc = jnp.sum(w_arc * s_0, axis=0)                 # (s_blk,)

        # Interpolate the block's own rows (two-level kernel arithmetic)
        # and fold each row straight into the line-integral partial.
        line = jnp.zeros((s_blk,), jnp.float32)
        for jj in range(_BLK):
            c6 = col6_ref[jj]                              # (3T, L)
            y = jnp.clip(y_ref[jj, :], 0.0, M - 1.0)
            hi = jnp.floor(y).astype(jnp.int32) // H
            ylo = y - (hi * H).astype(jnp.float32)
            onehot = (hs == hi[None, :]).astype(jnp.bfloat16)
            big = jax.lax.dot_general(
                c6, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)       # (3T, s_blk)
            tmp = (big[:T] + big[T:2 * T]) + big[2 * T:]
            hat = jnp.maximum(0.0, 1.0 - jnp.abs(ylo[None, :] - ts))
            g = jnp.sum(hat * tmp, axis=0) + kde_thresh
            line = line + g * w_line[jj, :]

        @pl.when(i == 0)
        def _init():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        out_ref[0, :] += line
        out_ref[1, :] += arc

    out_specs = [pl.BlockSpec((8, s_blk), lambda j, i: (0, j),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((8, S), jnp.float32)]
    if with_transpose:
        out_specs.append(pl.BlockSpec((s_blk, _BLK), lambda j, i: (j, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((S, E_pad), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=(n_sblk, n_eblk),
        in_specs=[
            pl.BlockSpec((_BLK, 3 * T, L), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLK, s_blk),
                         lambda j, i: (jnp.maximum(i - 1, 0), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLK, s_blk), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLK, s_blk),
                         lambda j, i: (jnp.minimum(i + 1, n_eblk - 1), j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
    )(col6, ysp, ysp, ysp)
    if with_transpose:
        (acc, yst) = out
        return acc[0], acc[1], yst
    return out[0][0], out[0][1]


@functools.partial(jax.jit,
                   static_argnames=("kde_thresh", "with_transpose"))
def _fused_cost_jit(cols, ys, kde_thresh, with_transpose=False):
    return _fused_cost_call(cols, ys, kde_thresh,
                            with_transpose=with_transpose)


# Emit the transposed samples copy only when the (E, S) layout-transpose
# it replaces is material (device-profiled: 22 ms at S=10⁵, ~2 ms at
# S=10⁴, noise at the demo's S=10³ where the extra store would only add
# kernel work).
_TRANSPOSE_MIN_S = 8192


def fused_curve_cost(cols, ys, kde_thresh: float = 0.0,
                     want_transpose=False):
    """Fused curve-cost quadratures, or ``None`` if ineligible.

    Eligibility: TPU backend, even E (odd quadrature point counts — the
    even-count Simpson tails never arise, so legacy ``even='avg'`` and
    modern rules coincide, gpet.py:404-405), the two-level decomposition
    engaged (M ≥ 4·H), and S wide enough to beat the unfused path's
    fusions. (col6 streams per e-block since r5, so no M cap remains —
    the former 8 MB full-residency gate excluded M ≥ ~1200.)
    Returns ``(line_integral, arc_length, samples_t)`` with (S,) float32
    quadratures; ``samples_t`` is the (S, E_pad) transposed samples copy
    when ``want_transpose`` and S ≥ _TRANSPOSE_MIN_S, else ``None``.
    """
    E, M = cols.shape
    _, S = ys.shape
    H = _H_for(M)
    if (jax.default_backend() != "tpu" or E % 2 != 0 or E < 2 * _BLK
            or M < 4 * H or S < 128):
        return None
    wt = bool(want_transpose) and S >= _TRANSPOSE_MIN_S
    out = _fused_cost_jit(cols, ys, float(kde_thresh), with_transpose=wt)
    if wt:
        return out
    return out[0], out[1], None


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
