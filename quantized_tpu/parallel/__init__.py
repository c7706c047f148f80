"""Mesh / sharding / collectives — the distribution layer.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(SURVEY.md #22/#23); here distribution is TPU-native: a 2-D
``Mesh(('data','model'))``, batch-sharded activations (DP), out-channel /
fc-column tensor-sharded weights (TP over ICI), collectives inserted by
GSPMD/pjit or placed explicitly with shard_map in the engine hot path, and
multi-host runtime via ``jax.distributed.initialize`` (DCN).
"""

from quantized_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, create_mesh, local_mesh
from quantized_tpu.parallel.sharding import (
    param_partition_spec,
    shard_model_state,
    activation_spec,
    int_engine_partition_spec,
    shard_int_engine_state,
)
