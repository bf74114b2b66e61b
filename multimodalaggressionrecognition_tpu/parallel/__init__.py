from .mesh import (
    data_sharding,
    initialize_distributed,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
