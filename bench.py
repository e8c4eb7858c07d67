"""Headline benchmark: device time per 500×500 edge trace (README demo
config, BASELINE.json config 1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
``value`` is the device-profiled time of the fused TPU trace in
milliseconds (the wall clock through the axon tunnel is ~90% RTT jitter —
VERDICT r4 item 6: r3→r4 `vs_baseline` swung 321×→191× on pure RTT noise
while the device number improved; the wall number is still reported as
``wall_ms``/``vs_baseline_wall``) and ``vs_baseline`` is the speedup over
the CPU reference implementation (benchmarks/reference_cpu.py — the
reference algorithm measured on this machine, since the reference's own
KDEpy/skimage deps are not installed here). Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import os

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache (VERDICT r4 item 3): the CLI already
    # enables one; bench paid ~69 s of selftest compiles + a 39 s first
    # call every run without it. Cold first run populates the cache;
    # subsequent bench runs deserialise in ~s. GPET_NO_CACHE=1 opts out
    # (for measuring true cold-compile time).
    if not os.environ.get("GPET_NO_CACHE"):
        cache_dir = os.environ.get(
            "GPET_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        log(f"compilation cache: {cache_dir}")

    import gaussian_process_edge_trace_tpu as gpt
    from gaussian_process_edge_trace_tpu.trace.driver import (
        init_state, make_config, make_data, run_trace)
    from gaussian_process_edge_trace_tpu.utils.selftest import run_selftest

    log("devices:", jax.devices())

    # On-device numeric smoke tier (VERDICT r3 item 4): pins the TPU-only
    # equivalences (take==one-hot, bf16 3-split, Pallas interp/chol) on
    # the REAL chip before any benchmark number is trusted. The CPU test
    # suite structurally cannot see these paths.
    run_selftest(log)
    if "--selftest" in sys.argv:
        print(json.dumps({"metric": "tpu_selftest", "value": 1,
                          "unit": "ok", "vs_baseline": 1}))
        return

    # README demo config (README.md:46-84).
    test_img, true_edge = gpt.construct_test_img(
        (500, 500), 200, 4, 0.05, "sinusoidal", 0.3, gaps=True)
    kernel = gpt.kernel_builder((11, 5), unit=False)
    grad = np.asarray(gpt.comp_grad_img(test_img, kernel), dtype=np.float64)
    init = true_edge[[0, -1]][:, [1, 0]]
    ko = {"kernel": "RBF", "sigma_f": 75, "length_scale": 20}
    kw = dict(noise_y=1, N_samples=1000, score_thresh=1, delta_x=5,
              keep_ratio=0.1, pixel_thresh=5, seed=1, fix_endpoints=True)

    # --- TPU path (fused program, steady state) --------------------------
    cfg = make_config(init, grad.shape, kernel_options=ko, **kw)
    data = make_data(cfg, jnp.asarray(grad), jnp.asarray(init))
    state0 = init_state(cfg)
    # Force one device->host fetch so the tunneled TPU runtime is in
    # synchronous mode BEFORE timing (CLAUDE.md measurement gotcha) —
    # explicitly, not as a side effect of preprocessing (ADVICE round 1).
    _ = float(jnp.sum(data.grad_img))
    t0 = time.perf_counter()
    res = jax.block_until_ready(run_trace(cfg, data, state0))
    first_call_s = time.perf_counter() - t0
    log(f"first call (incl compile): {first_call_s:.2f}s")
    # Timed loops force completion by FETCHING a scalar result leaf —
    # block_until_ready through the tunnel is not reliably a wait
    # (observed r3: it sometimes returns at ~1 RTT with the program
    # still running); a materialised host value cannot lie. Cost is the
    # same ~1 round trip when block does work.
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        res = run_trace(cfg, data, state0)
        _ = int(np.asarray(res.n_iters))
        times.append(time.perf_counter() - t0)
    tpu_ms = float(np.median(times) * 1e3)
    pred = np.asarray(res.edge_trace)
    tpu_mse = float(gpt.trace_MSE(pred, true_edge))
    tpu_dice = float(gpt.trace_dicecoef(pred, true_edge))
    log(f"tpu: {tpu_ms:.1f} ms  iters={int(res.n_iters)} "
        f"MSE={tpu_mse:.2f} DICE={tpu_dice:.4f}")

    # --- FLOP / MFU accounting --------------------------------------------
    # Wall MFU divides by a wall clock that is ~90% tunnel RTT; the
    # device-profiled MFU is the machine-utilisation number (VERDICT r3
    # item 3 — the wall figure undersold the device by ~6x).
    from benchmarks.flops import device_peak_flops, trace_flops
    from benchmarks.suite import _device_ms
    fl = trace_flops(cfg, int(res.n_iters))
    gflops = fl["total"] / 1e9
    flops_s = fl["total"] / (tpu_ms / 1e3)
    mfu_val = flops_s / device_peak_flops()
    dev_ms = _device_ms(run_trace, cfg, data, state0)
    dev_mfu = fl["total"] / (dev_ms / 1e3) / device_peak_flops()
    log(f"flops: {gflops:.2f} GFLOP/trace  achieved "
        f"{flops_s / 1e12:.3f} TFLOP/s  wall mfu={100 * mfu_val:.3f}%  "
        f"device {dev_ms:.2f} ms -> mfu={100 * dev_mfu:.3f}% of bf16 peak")

    # --- multi-seed accuracy (gate on the median, not one lucky seed) -----
    per_seed = [{"seed": cfg.seed, "mse": round(tpu_mse, 2),
                 "dice": round(tpu_dice, 4), "iters": int(res.n_iters)}]
    for extra_seed in (2, 3):
        key = jax.random.PRNGKey(extra_seed)
        r = jax.block_until_ready(run_trace(cfg, data, state0, key))
        p = np.asarray(r.edge_trace)
        per_seed.append({
            "seed": extra_seed,
            "mse": round(float(gpt.trace_MSE(p, true_edge)), 2),
            "dice": round(float(gpt.trace_dicecoef(p, true_edge)), 4),
            "iters": int(r.n_iters)})
    dices = sorted(s["dice"] for s in per_seed)
    median_dice = dices[len(dices) // 2]
    log(f"per-seed: {per_seed}  median DICE={median_dice:.4f}")

    # --- best-of-5 seed ensemble (one dispatch; clips the seed tail) ------
    from gaussian_process_edge_trace_tpu.parallel import trace_ensemble
    eb = jax.block_until_ready(trace_ensemble(cfg, data, state0, n_seeds=5))
    ens_dice = float(gpt.trace_dicecoef(np.asarray(eb.edge_trace),
                                        true_edge))
    log(f"best-of-5 ensemble: DICE={ens_dice:.4f} "
        f"cost={float(eb.final_cost):.4f}")

    # --- batched serving throughput (B=16 frames in ONE dispatch) ---------
    from gaussian_process_edge_trace_tpu.parallel.sharded import (
        make_batch_data, make_batch_state, trace_batch_vmap)
    B = 16
    gs, ins, eds = [], [], []
    for s in range(B):
        im, ed = gpt.construct_test_img(
            (500, 500), 200, 4, 0.05, "sinusoidal", 0.3, gaps=True,
            seed=1 + s)
        gs.append(np.asarray(gpt.comp_grad_img(im, kernel), np.float64))
        ins.append(ed[[0, -1]][:, [1, 0]])
        eds.append(ed)
    datab = make_batch_data(cfg, np.stack(gs), np.stack(ins))
    statesb = make_batch_state(cfg, B)
    rb = jax.block_until_ready(trace_batch_vmap(cfg, datab, statesb))
    bt = []
    for _ in range(3):
        t0 = time.perf_counter()
        rb = trace_batch_vmap(cfg, datab, statesb)
        _ = np.asarray(rb.n_iters)          # force completion (see above)
        bt.append(time.perf_counter() - t0)
    batch_s = float(np.median(bt))
    batch_dice = sorted(float(gpt.trace_dicecoef(
        np.asarray(rb.edge_trace)[f], eds[f])) for f in range(B))
    # Throughput-mode MFU: per-frame FLOPs at each frame's own iteration
    # count over the device-profiled batch time (VERDICT r3 item 3).
    batch_dev_ms = _device_ms(trace_batch_vmap, cfg, datab, statesb)
    batch_flops = sum(trace_flops(cfg, int(i))["total"]
                      for i in np.asarray(rb.n_iters))
    batch_mfu = batch_flops / (batch_dev_ms / 1e3) / device_peak_flops()
    log(f"batch B={B}: {batch_s*1e3:.1f} ms total, "
        f"{batch_s*1e3/B:.2f} ms/trace, {B/batch_s:.1f} traces/s, "
        f"device {batch_dev_ms:.1f} ms ({batch_dev_ms/B:.2f} ms/trace) "
        f"mfu={100*batch_mfu:.3f}%, DICE median={batch_dice[B//2]:.4f}")

    # --- CPU reference baseline ------------------------------------------
    from benchmarks.reference_cpu import ReferenceTracerCPU
    t0 = time.perf_counter()
    ref = ReferenceTracerCPU(init, grad, ko, **kw)
    ref_edge, _, ref_iters = ref()
    ref_ms = (time.perf_counter() - t0) * 1e3
    ref_mse = float(gpt.trace_MSE(ref_edge, true_edge))
    ref_dice = float(gpt.trace_dicecoef(ref_edge, true_edge))
    log(f"cpu reference: {ref_ms:.1f} ms  iters={ref_iters} "
        f"MSE={ref_mse:.2f} DICE={ref_dice:.4f}")

    # --- peak serving throughput (measured by the suite's B=64-256 sweep,
    # VERDICT r4 item 2; re-running that sweep each bench would dwarf the
    # headline, so the row is read from the suite's artifact with its
    # provenance field intact) -------------------------------------------
    peak_row = {}
    pt_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "benchmarks", "peak_throughput.json")
    if os.path.exists(pt_path):
        with open(pt_path) as f:
            peak_row = {"peak_throughput": json.load(f)}
        log(f"peak throughput (suite 1d sweep): {peak_row}")

    # Regression gates: demo-config DICE has ranged 0.989-0.997 across
    # seeds/numerics changes with a long lower tail. The 3-seed median
    # catches regressions a single lucky seed would hide; the per-seed
    # floor catches catastrophic breakage.
    assert median_dice > 0.985, \
        f"accuracy regression: median DICE {median_dice} ({per_seed})"
    assert min(dices) > 0.97, f"accuracy regression: seed DICEs {per_seed}"

    print(json.dumps({
        "metric": "trace_500x500_device_ms",
        "value": round(dev_ms, 2),
        "unit": "ms",
        "vs_baseline": round(ref_ms / dev_ms, 1),
        "wall_ms": round(tpu_ms, 2),
        "vs_baseline_wall": round(ref_ms / tpu_ms, 3),
        "first_call_s": round(first_call_s, 2),
        "gflops_per_trace": round(gflops, 2),
        "achieved_tflops_s": round(flops_s / 1e12, 4),
        "mfu": round(mfu_val, 5),
        "device_ms": round(dev_ms, 2),
        "device_mfu": round(dev_mfu, 5),
        "per_seed": per_seed,
        "median_dice": median_dice,
        "batch16_ms_per_trace": round(batch_s * 1e3 / B, 2),
        "batch16_device_ms_per_trace": round(batch_dev_ms / B, 3),
        "batch16_mfu": round(batch_mfu, 5),
        "batch16_traces_per_s": round(B / batch_s, 1),
        "batch16_dice_median": round(batch_dice[B // 2], 4),
        "ensemble5_dice": round(ens_dice, 4),
        **peak_row,
    }))


if __name__ == "__main__":
    main()
