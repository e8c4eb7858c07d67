"""The on-device smoke tier (utils/selftest.py) must also run green on the
CPU mesh — it is the driver's pre-bench gate (bench.py runs it before every
benchmark), so a silent break here would block every BENCH run."""

import pytest

from gaussian_process_edge_trace_tpu.utils.selftest import run_selftest


@pytest.mark.slow
def test_selftest_runs_green():
    results = run_selftest()
    assert [name for name, _ in results] == [
        "take_eq_onehot_rows", "take_eq_onehot_topk", "split3_bf16_exact",
        "interp_kernels_agree", "cholesky_auto_vs_jnp",
        "fused_cost_vs_unfused", "binning_2l_vs_dense"]
