"""Checkpoint / resume for trace state (SURVEY.md §5).

The reference has no checkpointing; its nearest feature is warm-starting
via the ``obs`` argument (gpet.py:57-61). Here the loop carry is an
explicit :class:`~.driver.TraceState` pytree, so warm-start, mid-trace
resume, and frame-sequence propagation are the same mechanism:

- :func:`save_checkpoint` / :func:`load_checkpoint` — serialise the
  TraceState TOGETHER with the full :class:`~.driver.TracerConfig` and a
  SHA-256 fingerprint of the per-image arrays, so a resume can verify it
  is continuing the same program on the same data (a mid-loop state is
  meaningless under a different config/image); loading refuses a
  mismatched config or fingerprint;
- :func:`save_state` / :func:`load_state` — raw TraceState (de)serialise
  (no validation), for callers that manage configs themselves;
- :func:`resume_trace` — continue a saved trace to completion: because
  :func:`~.driver.run_trace` takes the loop carry as its input, resuming
  is just calling it with the restored state;
- :func:`obs_from_result` — extract the accepted observations of a
  finished trace as an (n, 2) xy array, the warm-start currency for the
  next frame (gpet.py:57-61, BASELINE config 5).
"""

from __future__ import annotations

import hashlib
import json

import numpy as np

from gaussian_process_edge_trace_tpu.models.kernels import KernelSpec
from gaussian_process_edge_trace_tpu.trace.driver import (
    TracerConfig, TraceState, run_trace)
from gaussian_process_edge_trace_tpu.trace.select import BinSpec

_FIELDS = TraceState._fields


def cfg_to_json(cfg: TracerConfig) -> str:
    """Serialise a TracerConfig (incl. nested KernelSpec/BinSpec)."""
    d = cfg._asdict()
    d["kernel"] = dict(cfg.kernel._asdict())
    d["bins"] = dict(cfg.bins._asdict())
    return json.dumps(d, sort_keys=True)


def cfg_from_json(s: str) -> TracerConfig:
    d = json.loads(s)
    kernel = KernelSpec(**d.pop("kernel"))
    bins = BinSpec(**d.pop("bins"))
    # Fields added after a checkpoint was written default like the class.
    d.setdefault("reference_quirks", True)
    return TracerConfig(kernel=kernel, bins=bins, **d)


def data_fingerprint(data) -> str:
    """SHA-256 over the per-image arrays that define the trace program's
    inputs (gradient image + sorted init points). The config-derived
    leaves (prior factor, x-grid) are covered by the config itself."""
    h = hashlib.sha256()
    for f in ("grad_img", "init_x", "init_y"):
        a = np.ascontiguousarray(np.asarray(getattr(data, f)))
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def save_checkpoint(path, cfg: TracerConfig, state: TraceState,
                    data=None) -> None:
    """Persist state + config (+ data fingerprint when ``data`` given)."""
    arrays = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    np.savez(path, __cfg__=np.array(cfg_to_json(cfg)),
             __fingerprint__=np.array(
                 "" if data is None else data_fingerprint(data)),
             **arrays)


def load_checkpoint(path, expect_cfg: TracerConfig | None = None,
                    data=None):
    """Load ``(cfg, state)``; refuse a checkpoint whose config or data
    fingerprint does not match what the caller is about to resume with.

    Args:
      expect_cfg: when given, must equal the saved config exactly.
      data: when given (and the checkpoint recorded a fingerprint), the
        per-image arrays must hash to the saved fingerprint.

    Raises:
      ValueError: on config or fingerprint mismatch.
    """
    with np.load(path) as z:
        cfg = cfg_from_json(str(z["__cfg__"]))
        fp_saved = str(z["__fingerprint__"])
        state = TraceState(**{f: z[f] for f in _FIELDS})
    if expect_cfg is not None and expect_cfg != cfg:
        diffs = [f for f in TracerConfig._fields
                 if getattr(expect_cfg, f) != getattr(cfg, f)]
        raise ValueError(
            f"checkpoint config mismatch (fields {diffs}); refusing to "
            "resume a different trace program")
    if data is not None and fp_saved:
        fp_now = data_fingerprint(data)
        if fp_now != fp_saved:
            raise ValueError(
                "checkpoint data fingerprint mismatch (saved "
                f"{fp_saved[:12]}…, got {fp_now[:12]}…); refusing to "
                "resume on different image/init data")
    return cfg, state


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
