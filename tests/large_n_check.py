"""Large-n LML-fit scipy-gap check, runnable in-process or as a script.

Shared by ``tests/test_gpr.py::test_optimize_lml_batched_path_large_n``.
The n=408 case compiles a very large interpret-mode blocked-Pallas
program; doing that inside the long-lived pytest process reproducibly
poisoned a LATER, unrelated XLA:CPU compilation (segfault in
``backend_compile_and_load`` ~10 tests afterwards — 2/2 full slow-tier
runs, green with the case deselected), so the slow tier executes it in
a fresh subprocess via ``__main__`` below.
"""

import numpy as np


def run_check(n, cap, rng_seed, tol=1e-3):
    """Assert the batched n>160 coarse-to-fine fit matches converged
    scipy L-BFGS-B from the same starts to ``tol`` LML units."""
    import jax
    import jax.numpy as jnp
    from scipy.optimize import minimize

    from gaussian_process_edge_trace_tpu.models import gpr
    from gaussian_process_edge_trace_tpu.models.kernels import KernelSpec
    from gaussian_process_edge_trace_tpu.trace.driver import optimize_lml

    lb = np.log(np.array([0.01, 0.1, 1e-18]))
    ub = np.log(np.array([1e3, 100.0, 1.0]))
    rng = np.random.default_rng(rng_seed)
    spec = KernelSpec("RBF", 2.5)
    x = np.sort(rng.uniform(-2, 2, size=n))
    K = 5.0 * np.exp(-0.5 * ((x[:, None] - x[None, :]) / 0.7) ** 2)
    y = np.linalg.cholesky(K + 1e-8 * np.eye(n)) @ rng.normal(size=n)
    y = y + rng.normal(0, 0.3, size=n)
    y = (y - y.mean()) / y.std()
    xs = np.zeros(cap)
    ys_ = np.zeros(cap)
    mask = np.zeros(cap, bool)
    nw = np.ones(cap)
    xs[:n], ys_[:n], mask[:n] = x, y, True
    starts = np.concatenate(
        [np.clip(np.log([[5.0, 5.0, 1.0]]), lb, ub),
         rng.uniform(lb, ub, size=(12, 3))])

    def neg(theta):
        return -gpr.log_marginal_likelihood(
            spec, jnp.asarray(xs), jnp.asarray(ys_), jnp.asarray(mask),
            jnp.asarray(theta), jnp.asarray(nw), jitter=1e-6)

    nvg = jax.jit(jax.value_and_grad(neg))

    def sobj(t):
        f, g = nvg(t)
        if not np.isfinite(float(f)):
            return 1e30, np.zeros(3)
        return float(f), np.where(np.isfinite(g), np.asarray(g), 0.0)

    best = min(float(minimize(sobj, s, jac=True, method="L-BFGS-B",
                              bounds=list(zip(lb, ub))).fun)
               for s in starts)
    theta, lml = optimize_lml(
        spec, jnp.asarray(xs), jnp.asarray(ys_), jnp.asarray(mask),
        jnp.asarray(nw), jnp.asarray(starts), jnp.asarray(lb),
        jnp.asarray(ub), use_batched=True)
    assert float(-lml) <= best + tol, (float(-lml), best)
    print(f"large-n check ok: n={n} cap={cap} lml={float(lml):.6f} "
          f"scipy={-best:.6f}")


if __name__ == "__main__":
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    run_check(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
