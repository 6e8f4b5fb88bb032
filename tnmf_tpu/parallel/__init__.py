from . import distributed
from .sharding import (DATA_AXIS, SPATIAL_AXIS, data_sharding, h_sharding,
                       make_mesh, make_mesh_2d, replicated, shard_model_state,
                       spatial_sharding)

__all__ = ['DATA_AXIS', 'SPATIAL_AXIS', 'data_sharding', 'distributed',
           'h_sharding', 'make_mesh', 'make_mesh_2d', 'replicated',
           'shard_model_state', 'spatial_sharding']
