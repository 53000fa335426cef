from se3_diffusion_tpu.parallel.mesh import (
    DP_AXIS,
    SP_AXIS,
    batch_spec,
    create_mesh,
    replicate,
    shard_batch,
)

__all__ = [
    "DP_AXIS",
    "SP_AXIS",
    "batch_spec",
    "create_mesh",
    "replicate",
    "shard_batch",
]
