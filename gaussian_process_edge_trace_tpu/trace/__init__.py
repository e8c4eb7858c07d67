"""Trace pipeline: KDE, curve scoring, pixel selection, driver."""

from gaussian_process_edge_trace_tpu.trace.kde import (  # noqa: F401
    curve_kde, gradient_kde)
from gaussian_process_edge_trace_tpu.trace.scoring import (  # noqa: F401
    curve_costs, best_curves)
from gaussian_process_edge_trace_tpu.trace.select import (  # noqa: F401
    select_pixels)
