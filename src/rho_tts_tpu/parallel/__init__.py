"""Device-mesh parallelism: sharding specs and multi-chip execution.

Scale-out rides XLA collectives over ICI via ``jax.sharding`` — there is
no hand-written communication code. The reference has no distributed layer
(SURVEY.md §2.3); here batch data-parallelism replaces its ``batch_size``
loop and tensor-parallelism covers >1-chip model spans.
"""

from .inference import (
    enable_data_parallel,
    enable_parallelism,
    enable_sequence_parallel,
    enable_tensor_parallel,
)
from .mesh import create_mesh, default_mesh_shape
from .pipeline import (
    create_pipeline_mesh,
    pipeline_stack_forward,
    pipeline_train_step,
    shard_stack_for_pipeline,
)
from .sharding import (
    batch_sharding,
    chatterbox_param_specs,
    param_shardings,
    param_specs_for,
    qwen_param_specs,
    shard_params,
)
