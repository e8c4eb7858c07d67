"""KDE-binning floor study (VERDICT r4 item 1): prove or beat the dense
hat binning that dominated the 1000², S=10⁵ trace residue.

Run: ``python -m benchmarks.binning_floor``. Emits one JSON row per
measurement (machine-parsable; summary table to stderr):

(a) a pinned VPU roofline — a VMEM-resident f32 FMA chain measures this
    chip's achievable VPU FLOP/s; the dense hat block's achieved
    element-op rate is reported against it;
(b) the MXU-recast binning (``trace/pallas_kde._binning_pallas``: the
    per-column (M+2, S) @ (S, 1) HIGHEST GEMV in VMEM — the N=1 matvec
    that wastes the systolic array, previously dismissed without a
    number);
(c) the two-level ADJOINT binning (``_binning_2l``: compact tap columns
    + block one-hot MXU contraction — the adjoint of the decomposition
    that won 25× on the interp side), standalone and in-program.

All single-dispatch rows use the device-profiler timeline
(benchmarks/suite._device_ms), not tunnel wall-clock.
"""

from __future__ import annotations

import functools
import json
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(row):
    print(json.dumps(row), flush=True)


def vpu_roofline(_device_ms):
    """Measured f32 VPU op/s ceiling: K=64 mul+add steps over 8
    INDEPENDENT VMEM-resident (8, 65536) arrays — XLA loop-fuses the
    whole chain into one kernel, so a single dependent chain (ILP=1)
    exposes only one of the VPU's per-lane ALUs (measured 1.5e12 op/s on
    this chip); eight interleaved chains expose the full issue width.
    K=64 keeps XLA's scheduler sane (a K=512 chain took 222 s to
    compile). No HBM traffic after the first load, no MXU-eligible
    contraction: the rate is the elementwise ceiling the dense hat
    binning competes against."""
    import jax
    import jax.numpy as jnp

    K, P = 64, 16   # swept: (P,K)=(8,64)→2.73, (16,32)→2.25, (16,64)→3.02,
                    # (32,32)→2.01, (32,16)→1.28 Tops/s on v5e
    xs = [jnp.full((8, 65536), 0.999 + 1e-4 * i, jnp.float32)
          for i in range(P)]

    @jax.jit
    def chain(*xs):
        a = jnp.float32(0.9999)
        b = jnp.float32(1e-6)
        xs = list(xs)
        for _ in range(K):
            xs = [x * a + b for x in xs]
        return sum(xs)

    ms = _device_ms(chain, *xs)
    ops = 2.0 * K * P * xs[0].size        # mul + add per element-step
    rate = ops / (ms / 1e3)
    emit({"config": "a_vpu_roofline_parallel_chains",
          "value": round(ms, 3), "unit": "ms", "ops": ops,
          "vpu_f32_teraops": round(rate / 1e12, 3)})
    return rate


def main():
    import os

    import jax
    import jax.numpy as jnp

    import gaussian_process_edge_trace_tpu.trace.pallas_kde as pk
    from benchmarks.suite import _device_ms

    if not os.environ.get("GPET_NO_CACHE"):
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    log("devices:", jax.devices())
    vpu_rate = vpu_roofline(_device_ms)

    rng = np.random.default_rng(0)
    # Binning operates on the KEPT curves: S_bin = keep_ratio * N_samples
    # (driver.py best_curves -> curve_kde). The three production shapes:
    shapes = [
        ("demo_500_Sbin100", 500, 100, 500),
        ("1000_S1e4_Sbin1e3", 1000, 1000, 1000),
        ("1000_S1e5_Sbin1e4", 1000, 10000, 1000),
    ]
    for name, E, S, M in shapes:
        y = jnp.asarray(rng.uniform(-3, M + 2, (E, S)), jnp.float32)
        w = jnp.asarray(rng.random(S), jnp.float32)
        dense = jax.jit(functools.partial(
            pk._binning_dense_chunked, M=M))
        gemv = jax.jit(functools.partial(
            pk._binning_pallas.__wrapped__, M=M))
        two = jax.jit(functools.partial(pk._binning_2l.__wrapped__, M=M))

        ref = np.asarray(dense(y, w))
        md = _device_ms(dense, y, w)
        hat_mb = 32 * (M + 2) * 4 / 1e6 + (M + 2) * S * 4 / 1e6
        if hat_mb > 14.0:
            # The per-column (M+2, S) HIGHEST GEMV needs the whole hat
            # matrix in VMEM: at M=1000, S=1000 the scoped allocation is
            # 17 MB vs the 16 MB limit — the MXU recast cannot even
            # compile at the scale it was meant to help. Measured once
            # (JaxRuntimeError at S=1000); the failed allocation then
            # wedged the tunneled runtime for the rest of the process,
            # so larger shapes report the arithmetic bound instead of
            # re-triggering it.
            mg = f"VMEM OOM (hat block {hat_mb:.0f} MB > 16 MB VMEM)"
        else:
            try:
                mg = round(_device_ms(gemv, y, w), 3)
            except Exception as e:  # noqa: BLE001 — report failure mode
                mg = f"VMEM OOM ({type(e).__name__})"
        m2 = _device_ms(two, y, w)
        err2 = float(np.max(np.abs(np.asarray(two(y, w)) - ref))
                     / np.max(np.abs(ref)))
        # Dense block: each of the (M+2)·E·S tent evaluations needs AT
        # LEAST 3 elementwise ops however lowered (distance/compare,
        # max-or-select, fma into the accumulator) — a conservative
        # lower bound on the dense formulation's op count, so
        # pct_of_roofline is a LOWER bound on how close the execution is
        # to the chip's measured elementwise ceiling.
        elems = (M + 2) * E * S
        dense_rate = 3.0 * elems / (md / 1e3)
        emit({"config": f"b_binning_{name}", "unit": "ms",
              "dense_ms": round(md, 3),
              "dense_tent_evals_per_s": round(elems / (md / 1e3) / 1e12,
                                              4),
              "dense_pct_of_vpu_roofline_lb":
                  round(100 * dense_rate / vpu_rate, 1),
              "mxu_gemv_ms": mg,
              "two_level_adjoint_ms": round(m2, 3),
              "two_level_speedup_vs_dense": round(md / m2, 2),
              "two_level_rel_err": err2})
        log(f"{name}: dense {md:.3f} ms ({100*dense_rate/vpu_rate:.0f}% "
            f"of VPU roofline) | MXU GEMV {mg} | 2l adjoint {m2:.3f} "
            f"({md/m2:.2f}x) err {err2:.1e}")

    # In-program A/B at the two big configs (the gate decides per local
    # kept-curve count; force each arm via the module threshold).
    import gaussian_process_edge_trace_tpu as gpt
    from gaussian_process_edge_trace_tpu.trace.driver import (
        init_state, make_config, make_data, run_trace)

    img, edge = gpt.construct_test_img((1000, 1000), 400, 4, 0.05,
                                       "sinusoidal", 0.3, gaps=True)
    kb = gpt.kernel_builder((11, 5), unit=False)
    grad = gpt.comp_grad_img(jnp.asarray(img), kb)
    init = edge[[0, -1]][:, [1, 0]]
    saved = pk._2L_MIN_S
    try:
        for S in (10000, 100000):
            cfg = make_config(
                init, (1000, 1000),
                kernel_options={"kernel": "RBF", "sigma_f": 200,
                                "length_scale": 50},
                noise_y=1, N_samples=S, score_thresh=1, delta_x=5,
                keep_ratio=0.1, pixel_thresh=5, seed=1,
                fix_endpoints=True)
            data = make_data(cfg, grad, jnp.asarray(init))
            row = {"config": f"c_trace_1000_S{S}_inprogram", "unit": "ms"}
            for label, gate in (("dense", 10 ** 9), ("two_level", 256)):
                pk._2L_MIN_S = gate
                jax.clear_caches()
                ms = _device_ms(run_trace, cfg, data, init_state(cfg))
                r = run_trace(cfg, data, init_state(cfg))
                row[f"{label}_ms"] = round(ms, 2)
                row[f"{label}_iters"] = int(r.n_iters)
                row[f"{label}_mse"] = round(float(gpt.trace_MSE(
                    np.asarray(r.edge_trace), edge)), 2)
            row["speedup"] = round(row["dense_ms"] / row["two_level_ms"],
                                   3)
            emit(row)
            log(f"trace 1000² S={S}: dense {row['dense_ms']} ms -> 2l "
                f"{row['two_level_ms']} ms ({row['speedup']}x), "
                f"MSE {row['dense_mse']} == {row['two_level_mse']}")
    finally:
        pk._2L_MIN_S = saved


if __name__ == "__main__":
    main()
