"""Test configuration: force an 8-device virtual CPU platform.

Tests never require TPU hardware; sharding tests use the virtual CPU mesh
(SURVEY.md §4: the TPU analogue of a fake backend).
"""

import os

# The harness environment pins JAX_PLATFORMS=axon (real TPU); tests must
# run on the virtual CPU mesh, so force-overwrite rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Oracle comparisons (scipy/sklearn) are f64; enable x64 so formula tests
# validate the math at full precision. The TPU path runs f32 — its accuracy
# is covered by the tolerance-based end-to-end parity tests.
import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# The axon sitecustomize registers the TPU backend and overrides
# JAX_PLATFORMS; re-point the config at CPU before any backend initialises.
jax.config.update("jax_platforms", "cpu")
