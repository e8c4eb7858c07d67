"""Debug configuration — the SURVEY §5 "race detection / sanitizers" row.

The reference has no sanitizers (single-threaded NumPy); the JAX-native
equivalent is NaN checking (``jax_debug_nans``) plus host-side finite
validation of results. Enable globally with ``enable_debug()`` (or the
``GPET_DEBUG=1`` environment variable, honoured at package import), or
scoped with the :func:`debug_nans` context manager.

Caveat: two library paths produce NaNs BY DESIGN and sanitise them
internally — ``safe_cholesky``'s branchless jitter escalation (failed
factorisation candidates are NaN and discarded) and the LML screen's
non-PD probes (NaN values are replaced by +inf before ranking). Running
the full fused tracer under ``jax_debug_nans`` therefore flags those
intentional intermediates; the knob is for debugging individual stages
and user-level computations, and :func:`assert_all_finite` is the
whole-result validator that composes with the fused program.
"""

from __future__ import annotations

import contextlib


def enable_debug(enabled: bool = True) -> None:
    """Toggle ``jax_debug_nans``: any primitive producing a NaN under jit
    is re-run eagerly and raised as ``FloatingPointError`` pointing at
    the producing op."""
    import jax
    jax.config.update("jax_debug_nans", bool(enabled))


@contextlib.contextmanager
def debug_nans():
    """Scoped ``jax_debug_nans`` (restores the previous setting)."""
    import jax
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_all_finite(tree, name: str = "result") -> None:
    """Host-side finite check over every array leaf of a pytree (e.g. a
    ``TraceResult``). Raises ``FloatingPointError`` naming the offending
    leaf. Integer/bool leaves are skipped."""
    import jax
    import numpy as np

    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        a = np.asarray(leaf)
        if not np.issubdtype(a.dtype, np.floating):
            continue
        if not np.isfinite(a).all():
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}")
