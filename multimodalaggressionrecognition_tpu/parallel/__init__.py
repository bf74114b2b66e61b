from .mesh import make_mesh, data_sharding, replicated_sharding, shard_batch
