"""Tracing / profiling utilities (SURVEY.md §5).

The reference's only instrumentation is ``time.time()`` prints
(gpet.py:815,831-835,864-870,897-899). Here:

- :class:`PhaseTimer` — structured host-side wall-clock accumulation per
  phase, for the introspective driver path and preprocessing;
- :func:`device_trace` — context manager around ``jax.profiler.trace`` for
  XLA-level traces viewable in TensorBoard/Perfetto;
- :func:`trace_telemetry` — the per-iteration telemetry of a
  :class:`~..trace.driver.TraceResult` as a plain dict of NumPy arrays
  (costs, observation counts, adaptive thresholds — returned as arrays
  rather than printed, per the SURVEY plan);
- :func:`sync_timer` — truthful single-program timing through the
  tunneled-TPU runtime (which is asynchronous until the first
  device-to-host fetch): forces a sync, measures a dispatch baseline, and
  subtracts it.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


class PhaseTimer:
    """Accumulate wall-clock per named phase; ``report()`` returns a dict."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self):
        return {k: {"total_s": self.totals[k], "calls": self.counts[k],
                    "mean_s": self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}


@contextlib.contextmanager
def device_trace(log_dir):
    """``jax.profiler.trace`` as a context manager (TensorBoard format)."""
    import jax
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def trace_telemetry(result):
    """Per-iteration telemetry of a TraceResult as NumPy arrays."""
    n = int(result.n_iters)
    return {
        "n_iters": n,
        "converged": bool(result.converged),
        "optimal_costs": np.asarray(result.iter_costs[:n]),
        "n_obs": np.asarray(result.iter_nobs[:n]),
        "score_thresholds": np.asarray(result.iter_thresh[:n]),
        "theta": np.exp(np.asarray(result.theta)),
        "log_marginal_likelihood": float(result.lml),
        "final_cost": float(result.final_cost),
    }


def sync_timer(fn, *args, n=10):
    """Median wall-clock of one jitted program, dispatch-corrected.

    Forces the runtime into synchronous mode (a device→host fetch), then
    subtracts the round-trip baseline of an empty dispatch so the returned
    number is device-execution time.
    """
    import jax
    import jax.numpy as jnp

    _ = float(jnp.sum(jnp.ones((8,))))       # force sync mode
    ident = jax.jit(lambda v: v + 1.0)
    x = jnp.ones((8,), jnp.float32)

    def _fetch_scalar(out):
        # ``block_until_ready`` through the tunnel is not reliably a
        # wait (it sometimes no-ops even after the process has fetched —
        # observed r3), so completion is forced by materialising ONE
        # element of the first output leaf on the host. The extra
        # slice-dispatch + round trip applies identically to the
        # identity baseline and cancels in the subtraction.
        leaf = jax.tree_util.tree_leaves(out)[0]
        import numpy as _np
        return _np.asarray(leaf[(0,) * leaf.ndim])

    def med(f, *a, k=n):
        _fetch_scalar(f(*a))
        ts = []
        for _ in range(k):
            t0 = time.perf_counter()
            _fetch_scalar(f(*a))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    base = med(ident, x)
    return max(med(fn, *args) - base, 0.0)


def device_op_breakdown(fn, *args, top=20, log_dir=None):
    """Per-op DEVICE-side time of one call to ``fn(*args)``.

    Captures a ``jax.profiler`` trace and aggregates the device timeline
    by op name — the ground truth for attributing cost inside a fused
    program. Host-side wall timing through an async/tunneled runtime is
    unreliable below ~5 ms (CLAUDE.md measurement gotcha); this is how
    every round-2 optimisation target was found.

    Returns a list of ``(total_ms, op_name)`` sorted descending; entry 0
    is the whole jit program.
    """
    import collections
    import glob
    import gzip
    import json
    import shutil
    import tempfile

    import jax

    own = log_dir is None
    if own:
        log_dir = tempfile.mkdtemp(prefix="gpet_prof_")
    jax.block_until_ready(fn(*args))          # compile outside the trace
    jax.profiler.start_trace(log_dir)
    jax.block_until_ready(fn(*args))
    jax.profiler.stop_trace()
    files = glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz")
    data = json.load(gzip.open(sorted(files)[-1]))
    names = {e["pid"]: e["args"].get("name")
             for e in data["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    def collect(device_only):
        agg = collections.Counter()
        for e in data["traceEvents"]:
            pname = str(names.get(e.get("pid")))
            dev = "TPU" in pname or "/device:" in pname
            if e.get("ph") == "X" and "dur" in e and dev == device_only:
                agg[e["name"]] += e["dur"]
        return agg

    agg = collect(True)
    if not agg:
        # CPU backend: no device timeline — fall back to the host one
        # (approximate; includes runtime frames).
        agg = collect(False)
    if own:
        shutil.rmtree(log_dir, ignore_errors=True)
    return [(dur / 1e3, name) for name, dur in agg.most_common(top)]
