"""Image-sequence tracing with warm starts (BASELINE config 5).

Traces an edge through a stack of noisy frames, propagating each frame's
accepted observations into the next frame's first GP fit (the reference's
``obs`` mechanism, gpet.py:57-61) — warm-started frames typically converge
in 0-2 iterations instead of ~12.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

import gaussian_process_edge_trace_tpu as gpt  # noqa: E402
from gaussian_process_edge_trace_tpu.parallel import trace_sequence  # noqa: E402
from gaussian_process_edge_trace_tpu.trace.driver import make_config  # noqa: E402


def main():
    n_frames = 5
    rng = np.random.RandomState(0)
    base_img, base_edge = gpt.construct_test_img(
        (500, 500), 200, 4, 0.03, "sinusoidal", 0.3, gaps=False)
    kb = gpt.kernel_builder((11, 5), unit=False)

    frames, inits = [], []
    for _ in range(n_frames):
        img = np.clip(base_img + rng.normal(0, 0.02, base_img.shape), 0, 1)
        frames.append(np.asarray(gpt.comp_grad_img(jnp.asarray(img), kb)))
        inits.append(base_edge[[0, -1]][:, [1, 0]])

    cfg = make_config(inits[0], (500, 500),
                      kernel_options={"kernel": "RBF", "sigma_f": 75,
                                      "length_scale": 20},
                      noise_y=1, N_samples=1000, score_thresh=1, delta_x=5,
                      keep_ratio=0.1, pixel_thresh=5, seed=1,
                      fix_endpoints=True)

    trace_sequence(cfg, frames[:2], inits[:2])   # compile cold+warm paths
    t0 = time.perf_counter()
    results = trace_sequence(cfg, frames, inits)
    dt = time.perf_counter() - t0
    print(f"{n_frames} frames in {dt:.2f}s "
          f"({dt / n_frames * 1e3:.0f} ms/frame steady incl host)")
    for f, res in enumerate(results):
        mse = float(gpt.trace_MSE(np.asarray(res.edge_trace), base_edge))
        print(f"frame {f}: iters={int(res.n_iters)} MSE={mse:.2f}")


if __name__ == "__main__":
    main()
