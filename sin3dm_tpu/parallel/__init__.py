from . import halo
from .halo import halo_conv2d, make_spatial_mesh, shard_plane
from .mesh import (batch_sharding, make_mesh, replicate, replicated,
                   shard_batch)
