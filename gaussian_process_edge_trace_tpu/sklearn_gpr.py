"""Drop-in alias for the reference's vendored ``sklearn_gpr`` module
(reference sklearn_gpr.py:31-610,617-721): the JAX-native
GaussianProcessRegressor and kernel objects."""

from gaussian_process_edge_trace_tpu.models.sklearn_api import (  # noqa: F401
    ConstantKernel, GaussianProcessRegressor, Matern, RBF,
    WeightedWhiteKernel)
