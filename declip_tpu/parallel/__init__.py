from declip_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    DCN_AXIS,
    batch_axes,
    batch_sharding,
    make_mesh,
    maybe_initialize_distributed,
    replicated,
    shard_batch,
)
