"""Checkpoint / resume for trace state (SURVEY.md §5).

The reference has no checkpointing; its nearest feature is warm-starting
via the ``obs`` argument (gpet.py:57-61). Here the loop carry is an
explicit :class:`~.driver.TraceState` pytree, so warm-start, mid-trace
resume, and frame-sequence propagation are the same mechanism:

- :func:`save_state` / :func:`load_state` — (de)serialise a TraceState
  (or any flat pytree of arrays) to a ``.npz``;
- :func:`resume_trace` — continue a saved trace to completion: because
  :func:`~.driver.run_trace` takes the loop carry as its input, resuming
  is just calling it with the restored state;
- :func:`obs_from_result` — extract the accepted observations of a
  finished trace as an (n, 2) xy array, the warm-start currency for the
  next frame (gpet.py:57-61, BASELINE config 5).
"""

from __future__ import annotations

import numpy as np

from gaussian_process_edge_trace_tpu.trace.driver import (
    TraceState, run_trace)

_FIELDS = TraceState._fields


def save_state(path, state: TraceState) -> None:
    np.savez(path, **{f: np.asarray(getattr(state, f)) for f in _FIELDS})


def load_state(path) -> TraceState:
    with np.load(path) as z:
        return TraceState(**{f: z[f] for f in _FIELDS})


def resume_trace(cfg, data, state: TraceState):
    """Continue a (possibly mid-loop) trace to completion."""
    return run_trace(cfg, data, state)


def obs_from_result(result):
    """Accepted observations of a finished trace, (n, 2) xy int array."""
    valid = np.asarray(result.obs_valid)
    return np.stack([np.asarray(result.obs_x)[valid],
                     np.asarray(result.obs_y)[valid]], axis=1).astype(
                         np.int64)
