"""Multi-device parallelism: dp over frames, sp over posterior samples."""

from gaussian_process_edge_trace_tpu.parallel.sharded import (  # noqa: F401
    DATA_AXIS, SAMPLE_AXIS, make_batch_data, make_batch_state,
    make_mesh, sharded_trace_batch, trace_batch_vmap, trace_ensemble,
    trace_multi_edge, trace_sequence)
