from .mesh import (batch_sharding, make_mesh, replicate, replicated,
                   shard_batch)
