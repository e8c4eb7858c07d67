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

    def med(f, *a, k=n):
        jax.block_until_ready(f(*a))
        ts = []
        for _ in range(k):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*a))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    base = med(ident, x)
    return max(med(fn, *args) - base, 0.0)
