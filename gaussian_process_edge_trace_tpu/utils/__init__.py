from .image import kernel_builder, normalise, comp_grad_img, denoise
from .synthetic import construct_test_img
from .metrics import trace_MSE, trace_relarea, trace_dicecoef
from .plotting import plot_results

__all__ = [
    "kernel_builder", "normalise", "comp_grad_img", "denoise",
    "construct_test_img", "trace_MSE", "trace_relarea", "trace_dicecoef",
]
