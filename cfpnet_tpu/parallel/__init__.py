from .mesh import (make_mesh, make_mesh_2d, batch_sharding,
                   replicated_sharding, shard_batch, shard_batch_spatial,
                   shard_batch_spatial_presplit)
