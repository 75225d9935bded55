"""Scale-out: device meshes, parameter sharding, batched attribution.

The reference is single-process/single-GPU (SURVEY.md §2.4: no DP/TP/PP/SP
anywhere; multi-GPU is only HF ``device_map`` placement). Here parallelism is
first-class: a ``jax.sharding.Mesh`` with ``data`` and ``model`` axes, GSPMD
sharding annotations on params and batch, and XLA-inserted collectives over
ICI. The relevance backward inherits the forward's shardings automatically —
no communication code at all.
"""

from lxt_tpu.parallel.mesh import (
    attribute_sharded,
    family_param_shardings,
    family_param_specs,
    llama_param_shardings,
    make_mesh,
    mixtral_param_shardings,
    shard_params,
)
from lxt_tpu.parallel.pipeline_parallel import (
    attribute_pipeline_parallel,
    make_pipeline_driver,
    pipeline_param_shardings,
)
from lxt_tpu.parallel.ring import attribute_sequence_parallel, ring_flash_attention

__all__ = [
    "make_mesh", "llama_param_shardings", "mixtral_param_shardings",
    "family_param_specs", "family_param_shardings",
    "shard_params", "attribute_sharded",
    "ring_flash_attention", "attribute_sequence_parallel",
    "make_pipeline_driver", "pipeline_param_shardings",
    "attribute_pipeline_parallel",
]
