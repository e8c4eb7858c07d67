"""Checkpoint / resume: interrupt a trace mid-loop, persist it with its
config and data fingerprint, reload, and finish — the resumed result is
identical to an uninterrupted run.

Run: ``python examples/checkpoint_resume.py``.
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gaussian_process_edge_trace_tpu as gpt  # noqa: E402
from gaussian_process_edge_trace_tpu.trace.checkpoint import (  # noqa: E402
    load_checkpoint, resume_trace, save_checkpoint)
from gaussian_process_edge_trace_tpu.trace.driver import (  # noqa: E402
    init_state, make_config, make_data, run_trace, trace_step)


def main():
    img, edge = gpt.construct_test_img((128, 128), 40, 2, 0.02,
                                       "sinusoidal", 0.3, gaps=False)
    grad = np.asarray(gpt.comp_grad_img(img, gpt.kernel_builder((7, 3))))
    init = np.array([[0, edge[0, 0]], [127, edge[127, 0]]])
    cfg = make_config(init, grad.shape,
                      kernel_options={"kernel": "RBF", "sigma_f": 30,
                                      "length_scale": 10},
                      noise_y=1, N_samples=256, score_thresh=0.5,
                      delta_x=6, keep_ratio=0.1, pixel_thresh=4, seed=1,
                      fix_endpoints=True)
    data = make_data(cfg, grad, init)

    full = run_trace(cfg, data, init_state(cfg))
    print(f"uninterrupted: {int(full.n_iters)} iterations")

    # Run two iterations, then "crash" and checkpoint.
    state, _ = trace_step(cfg, data, init_state(cfg))
    state, _ = trace_step(cfg, data, state)
    path = os.path.join(tempfile.mkdtemp(), "trace.npz")
    save_checkpoint(path, cfg, state, data=data)
    print(f"checkpointed after 2 iterations -> {path}")

    # A different process would reconstruct the config from the file; the
    # fingerprint check refuses to resume on the wrong image.
    cfg2, state2 = load_checkpoint(path, expect_cfg=cfg, data=data)
    resumed = resume_trace(cfg2, data, state2)
    same = bool(np.array_equal(np.asarray(resumed.edge_trace),
                               np.asarray(full.edge_trace)))
    print(f"resumed: {int(resumed.n_iters)} iterations total; "
          f"identical trace to uninterrupted run: {same}")
    mse = float(gpt.trace_MSE(np.asarray(resumed.edge_trace), edge))
    print(f"MSE vs ground truth: {mse:.2f}")


if __name__ == "__main__":
    main()
