"""Batched small-matrix Cholesky + triangular solves, batch-on-lanes.

XLA's TPU ``cholesky``/``triangular_solve`` custom calls process a batch
SEQUENTIALLY (measured ~12 µs per 104×104 f32 factorisation regardless of
batch: 163 LML screen evaluations = 1.9 ms of pure Cholesky). The
hyperparameter-fit path evaluates hundreds of tiny independent Grams, so
these kernels put the BATCH on the VPU lane dimension instead: one grid
program factorises up to 128 matrices simultaneously with (n, n, 128)
vectorised rank-1 updates.

Layout contract: arrays are carried as (n, m, B) inside the kernels
(batch minor = lanes); the public wrappers accept/return the natural
(B, n, m), let XLA insert the transposes, and chunk the batch in 128-lane
pieces with the input aliased to the output (a (104, 104, 128) f32 block
is 5.3 MB — in+out+scratch must stay inside the 16 MB VMEM).

Numerics: plain right-looking Cholesky in f32, no pivoting — the same
algorithm class as LAPACK potrf; parity with ``jnp.linalg.cholesky`` is
pinned in tests (associativity differs, bitwise equality is not
expected). Non-PD inputs produce NaNs from the sqrt of a negative Schur
complement, exactly like XLA's cholesky — callers keep their existing
NaN-guard semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_B_BLK = 128   # batch lanes per kernel invocation (1 lane group)


_CHOL_PANEL = 32   # static panel width for the trailing-block restriction


def _chol_kernel_body(a_ref, n: int):
    # a_ref: (n, n, B), input aliased to output — factor in place.
    # Right-looking Cholesky, batch on lanes: every step's
    # sqrt/divide/rank-1 update runs on all B matrices at once.
    #
    # K is symmetric, so "column k" is read as ROW k (dynamic indexing is
    # only needed on the leading dim, which Mosaic supports), and the
    # finished L column is likewise written as row k — the buffer ends up
    # holding Lᵀ, which the wrapper untransposes.
    #
    # Panel blocking: step k's rank-1 update only touches entries
    # (i > k, j > k), so restricting it to the trailing block suffices —
    # but the trailing extent is dynamic. A static Python loop over
    # _CHOL_PANEL-wide panels gives static slice starts: inside panel p0
    # every live entry has i, j >= p0, cutting the update work from n³ to
    # ~n³/3 elementwise ops (0.608 → 0.268 ms per 6-call polish site at
    # n=104, B=128 on v5e). Same operations on live entries in the same
    # order ⇒ bitwise-identical factor.
    for p0 in range(0, n, _CHOL_PANEL):
        m = n - p0
        w = min(_CHOL_PANEL, m)
        rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)

        def step(kr, _, p0=p0, m=m, rows=rows):
            row = a_ref[p0 + kr][p0:]                     # (m, B)
            # Diagonal element via masked reduce (no dynamic value
            # slicing in Mosaic).
            d = jnp.sqrt(jnp.sum(jnp.where(rows == kr, row, 0.0), axis=0,
                                 keepdims=True))          # (1, B)
            sub = jnp.where(rows > kr, row / d, 0.0)      # (m, B)
            a_ref[p0:, p0:, :] = (a_ref[p0:, p0:, :]
                                  - sub[:, None, :] * sub[None, :, :])
            a_ref[p0 + kr, p0:] = sub + jnp.where(rows == kr, d, 0.0)
            return 0

        jax.lax.fori_loop(0, w, step, 0)
    # Clear the strictly-"upper" (here: below-row-diagonal stale) part.
    upper = (jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
             > jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1))
    a_ref[...] = jnp.where(upper, 0.0, a_ref[...])


# The solve bodies have two regimes, gated by n:
#   - n <= _UNROLL_N: a Python-unrolled row loop with exact triangular
#     slices (minimal flops; ~0.55 ms faster per trace at n=104).
#   - n > _UNROLL_N: a fori_loop with an O(1)-IR full-height masked
#     reduce per row (2× the triangular-minimal flops). The unrolled
#     loop at n=128 drove Mosaic compile times pathological (the r3
#     n=208 LML-fit hang), exactly like the unrolled k-loop documented
#     on the Cholesky body — so panel sizes and larger always take the
#     compile-light path.
# Both regimes compute the identical substitution in the identical
# order; equivalence across the gate is pinned by
# tests/test_ops_numerics.py::test_solve_body_regimes_equivalent.
_UNROLL_N = 112


def _fwd_solve_kernel_body(l_ref, z_ref, n: int):
    # Solve L Z = RHS in place (rhs aliased to z_ref); finished rows
    # j < i read back from the output ref (read-after-write).
    if n <= _UNROLL_N:
        for i in range(n):
            acc = z_ref[i, :, :]
            if i > 0:
                acc = acc - jnp.sum(l_ref[i, :i, :][:, None, :]
                                    * z_ref[:i, :, :], axis=0)
            z_ref[i, :, :] = acc / l_ref[i, i, :][None, :]
        return

    rows3 = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def step(i, _):
        li = l_ref[i]                                     # (n, B)
        done = jnp.where(rows3 < i, z_ref[...], 0.0)      # (n, m, B)
        acc = z_ref[i] - jnp.sum(li[:, None, :] * done, axis=0)
        d = jnp.sum(jnp.where(rows2 == i, li, 0.0), axis=0)   # (B,)
        z_ref[i] = acc / d[None, :]
        return 0

    jax.lax.fori_loop(0, n, step, 0)


def _bwd_solve_kernel_body(lt_ref, z_ref, n: int):
    # Solve Lᵀ Z = RHS in place. ``lt_ref`` holds Lᵀ (the wrapper
    # transposes outside the kernel) so "column i of L" is the leading-dim
    # row read Mosaic supports; otherwise mirrors the forward body with
    # the j > i mask and a reversed row order.
    if n <= _UNROLL_N:
        for i in range(n - 1, -1, -1):
            acc = z_ref[i, :, :]
            if i < n - 1:
                acc = acc - jnp.sum(lt_ref[i, i + 1:, :][:, None, :]
                                    * z_ref[i + 1:, :, :], axis=0)
            z_ref[i, :, :] = acc / lt_ref[i, i, :][None, :]
        return

    rows3 = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def step(t, _):
        i = n - 1 - t
        lti = lt_ref[i]                                   # (n, B)
        done = jnp.where(rows3 > i, z_ref[...], 0.0)      # (n, m, B)
        acc = z_ref[i] - jnp.sum(lti[:, None, :] * done, axis=0)
        d = jnp.sum(jnp.where(rows2 == i, lti, 0.0), axis=0)  # (B,)
        z_ref[i] = acc / d[None, :]
        return 0

    jax.lax.fori_loop(0, n, step, 0)


def _chunk_call(kernel, operands, aliased_idx, out_shape):
    """One gridless pallas_call with ``operands[aliased_idx]`` aliased to
    the single output (keeps one VMEM copy of the big block). Interpret
    mode off-TPU so the CPU test suite exercises the same code path."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                  for _ in operands],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape,
        input_output_aliases={aliased_idx: 0},
        interpret=jax.default_backend() != "tpu",
    )(*operands)


def _lane_groups(Xt, pad_lane):
    """(n, m, B) → (G, n, m, 128) lane groups, padding the batch tail with
    ``pad_lane`` (an (n, m) matrix replicated on the padded lanes)."""
    n, m, B = Xt.shape
    G = (B + _B_BLK - 1) // _B_BLK
    Bp = G * _B_BLK
    if Bp != B:
        fill = jnp.broadcast_to(pad_lane.astype(Xt.dtype)[:, :, None],
                                (n, m, Bp - B))
        Xt = jnp.concatenate([Xt, fill], axis=2)
    return jnp.moveaxis(Xt.reshape(n, m, G, _B_BLK), 2, 0)


def _ungroup(out, B):
    """(G, n, m, 128) → (n, m, B)."""
    G, n, m, w = out.shape
    return jnp.moveaxis(out, 0, 2).reshape(n, m, G * w)[:, :, :B]


def _map_groups(one, groups):
    """Apply the single-group kernel over (G, ...) groups. ``lax.map``
    (not a Python loop) keeps the HLO one loop regardless of G, and each
    iteration is the gridless aliased call — VMEM holds ONE
    (n, n, 128) block, never Pallas's double-buffered grid pipeline
    (which OOMed scoped VMEM under a frame-level vmap)."""
    if groups.shape[0] == 1:
        return one(groups[0])[None]
    return jax.lax.map(one, groups)


def _flatten_vmap(fn):
    """custom_vmap rule factory: a leading batch axis is semantically just
    more matrices, so vmap flattens it into the lane batch instead of
    letting Pallas's generic batching rule grid over it (which re-buffers
    whole VMEM-sized blocks and OOMs at frame-batch sizes >= ~4)."""
    from jax.custom_batching import custom_vmap

    wrapped = custom_vmap(fn)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [a if b else
                jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, b in zip(args, in_batched)]
        F, B = args[0].shape[0], args[0].shape[1]
        flat = [a.reshape((F * B,) + a.shape[2:]) for a in args]
        out = wrapped(*flat)
        return out.reshape((F, B) + out.shape[1:]), True

    return wrapped


def _batched_cholesky_impl(K):
    B, n, _ = K.shape
    dt = K.dtype
    Kt = jnp.transpose(K, (1, 2, 0))                          # (n, n, B)

    def kern(k_ref, o_ref):
        _chol_kernel_body(o_ref, n)

    def one(blk):
        return _chunk_call(kern, [blk], 0,
                           jax.ShapeDtypeStruct((n, n, _B_BLK), dt))

    groups = _lane_groups(Kt, jnp.eye(n))   # identity pad: PD, no NaNs
    out = _ungroup(_map_groups(one, groups), B)
    # Buffer holds Lᵀ in (row-of-Lᵀ = col-of-L, ·, B) layout.
    return jnp.transpose(out, (2, 1, 0))


# A solve kernel holds the (n, n, 128) L block PLUS the aliased
# (n, m, 128) RHS/solution block in VMEM at once. Wide right-hand sides
# (the K⁻¹ = L⁻ᵀL⁻¹ identity solves in models/gpr.batched_lml) blow the
# ~16 MB VMEM once n·(n+m)·128·4 bytes gets close to it, so the RHS is
# chunked along m — columns of a triangular solve are independent, the
# chunk loop is a lax.map over identical kernel invocations.
_VMEM_SOLVE_BUDGET = 15 * 1024 * 1024


def _batched_solve_impl(L, RHS, lower_fwd: bool):
    B, n, m = RHS.shape
    elt = RHS.dtype.itemsize
    free = _VMEM_SOLVE_BUDGET - n * n * _B_BLK * elt
    # The fori_loop body (n > _UNROLL_N) materialises full-height masked
    # temporaries (`done` and the product against it) on the Mosaic
    # scoped-vmem stack — ~2 extra copies of the RHS block on top of the
    # aliased block itself. Budgeting only 1 copy compiled an
    # (L=128³, RHS=128×56×128) block to a 17.79M scoped allocation inside
    # the fused finish_trace (the (512, 1536) non-square trace, r4) —
    # 1.79M over the 16M limit. The unrolled regime's exact-slice temps
    # are small; it keeps the 1-copy model.
    copies = 3 if n > _UNROLL_N else 1
    max_m = free // (copies * n * _B_BLK * elt)
    if max_m >= m:
        return _solve_one_block(L, RHS, lower_fwd)
    mc = 64
    while mc > max(max_m, 8):
        # Chunk best-effort down to 8 columns even when L alone crowds
        # the budget — a narrower block is always lighter than the full
        # RHS would be.
        mc //= 2
    k = -(-m // mc)
    Rp = jnp.pad(RHS, ((0, 0), (0, 0), (0, k * mc - m)))
    chunks = jnp.moveaxis(Rp.reshape(B, n, k, mc), 2, 0)   # (k, B, n, mc)
    out = jax.lax.map(lambda R: _solve_one_block(L, R, lower_fwd), chunks)
    return jnp.moveaxis(out, 0, 2).reshape(B, n, k * mc)[:, :, :m]


def _solve_one_block(L, RHS, lower_fwd: bool):
    B, n, m = RHS.shape
    dt = RHS.dtype
    # fwd reads rows of L; bwd reads columns (as rows of Lᵀ — the extra
    # swapaxes happens in XLA, outside the kernel).
    Lt = jnp.transpose(L.astype(dt),
                       (1, 2, 0) if lower_fwd else (2, 1, 0))
    Rt = jnp.transpose(RHS, (1, 2, 0))
    body = (_fwd_solve_kernel_body if lower_fwd
            else _bwd_solve_kernel_body)

    def kern(l_ref, r_ref, z_ref):
        body(l_ref, z_ref, n)

    def one(args):
        lb, rb = args
        return _chunk_call(kern, [lb, rb], 1,
                           jax.ShapeDtypeStruct((n, m, _B_BLK), dt))

    lg = _lane_groups(Lt, jnp.eye(n))
    rg = _lane_groups(Rt, jnp.zeros((n, m)))
    if lg.shape[0] == 1:
        out = one((lg[0], rg[0]))[None]
    else:
        out = jax.lax.map(one, (lg, rg))
    return jnp.transpose(_ungroup(out, B), (2, 0, 1))


batched_cholesky = jax.jit(_flatten_vmap(_batched_cholesky_impl))
batched_cholesky.__doc__ = (
    "Lower Cholesky of a (B, n, n) PD batch, batch-on-lanes kernel. "
    "vmap flattens extra leading axes into the batch.")

batched_forward_solve = jax.jit(
    _flatten_vmap(lambda L, RHS: _batched_solve_impl(L, RHS, True)))
batched_forward_solve.__doc__ = (
    "Solve ``L Z = RHS`` for a (B, n, n) lower batch, RHS (B, n, m).")

batched_backward_solve = jax.jit(
    _flatten_vmap(lambda L, RHS: _batched_solve_impl(L, RHS, False)))
batched_backward_solve.__doc__ = (
    "Solve ``Lᵀ Z = RHS`` for a (B, n, n) lower batch, RHS (B, n, m).")


# ---------------------------------------------------------------------------
# Blocked variants: the in-VMEM kernels cap at n ~ 160 per 128-lane block
# ((n, n, 128) f32 must fit VMEM). For larger n, orchestrate a standard
# blocked right-looking factorisation in XLA — panel Choleskys and panel
# triangular solves via the Pallas kernels, trailing updates as batched
# MXU matmuls (which XLA batches efficiently, unlike its cholesky).
# ---------------------------------------------------------------------------

_PANEL = 128          # panel width (panel blocks fit VMEM at 128 lanes)
_DIRECT_N = 160       # largest n the unblocked kernels handle


def _hi(x):
    return jax.lax.Precision.HIGHEST


def cholesky_auto(K):
    """Batched lower Cholesky for any n: direct kernel when the block
    fits VMEM, blocked panels otherwise."""
    n = K.shape[1]
    if n <= _DIRECT_N:
        return batched_cholesky(K)
    return _cholesky_blocked(K)


def _cholesky_blocked(K):
    B, n, _ = K.shape
    p = _PANEL
    panels = [min(p, n - s) for s in range(0, n, p)]
    L = jnp.zeros_like(K)
    off = 0
    for w in panels:
        # Schur-updated diagonal block.
        Lrow = jax.lax.slice(L, (0, off, 0), (B, off + w, off))  # (B,w,off)
        D = (jax.lax.slice(K, (0, off, off), (B, off + w, off + w))
             - jnp.einsum("bik,bjk->bij", Lrow, Lrow, precision=_hi(0)))
        Lkk = batched_cholesky(D)
        L = jax.lax.dynamic_update_slice(L, Lkk, (0, off, off))
        rem = n - off - w
        if rem > 0:
            Lbelow = jax.lax.slice(L, (0, off + w, 0), (B, n, off))
            R = (jax.lax.slice(K, (0, off + w, off), (B, n, off + w))
                 - jnp.einsum("bik,bjk->bij", Lbelow, Lrow,
                              precision=_hi(0)))          # (B, rem, w)
            # Solve X Lkkᵀ = R  ⇔  Lkk Xᵀ = Rᵀ.
            Xt = batched_forward_solve(Lkk, jnp.swapaxes(R, 1, 2))
            L = jax.lax.dynamic_update_slice(
                L, jnp.swapaxes(Xt, 1, 2), (0, off + w, off))
        off += w
    return L


def forward_solve_auto(L, RHS):
    """Blocked-capable ``L Z = RHS`` (see :func:`cholesky_auto`)."""
    n = RHS.shape[1]
    if n <= _DIRECT_N:
        return batched_forward_solve(L, RHS)
    B, _, m = RHS.shape
    p = _PANEL
    Z = jnp.zeros_like(RHS)
    off = 0
    while off < n:
        w = min(p, n - off)
        Lkk = jax.lax.slice(L, (0, off, off), (B, off + w, off + w))
        Lrow = jax.lax.slice(L, (0, off, 0), (B, off + w, off))
        Zprev = jax.lax.slice(Z, (0, 0, 0), (B, off, m))
        R = (jax.lax.slice(RHS, (0, off, 0), (B, off + w, m))
             - jnp.einsum("bij,bjm->bim", Lrow, Zprev, precision=_hi(0)))
        Z = jax.lax.dynamic_update_slice(
            Z, batched_forward_solve(Lkk, R), (0, off, 0))
        off += w
    return Z


def backward_solve_auto(L, RHS):
    """Blocked-capable ``Lᵀ Z = RHS``."""
    n = RHS.shape[1]
    if n <= _DIRECT_N:
        return batched_backward_solve(L, RHS)
    B, _, m = RHS.shape
    p = _PANEL
    Z = jnp.zeros_like(RHS)
    offs = list(range(0, n, p))
    for off in reversed(offs):
        w = min(p, n - off)
        Lkk = jax.lax.slice(L, (0, off, off), (B, off + w, off + w))
        Lcol = jax.lax.slice(L, (0, off + w, off), (B, n, off + w))
        Zbelow = jax.lax.slice(Z, (0, off + w, 0), (B, n, m))
        R = (jax.lax.slice(RHS, (0, off, 0), (B, off + w, m))
             - jnp.einsum("bji,bjm->bim", Lcol, Zbelow, precision=_hi(0)))
        Z = jax.lax.dynamic_update_slice(
            Z, batched_backward_solve(Lkk, R), (0, off, 0))
    return Z
