from .sharding import (DATA_AXIS, data_sharding, make_mesh, replicated,
                       shard_model_state, spatial_sharding)

__all__ = ['DATA_AXIS', 'data_sharding', 'make_mesh', 'replicated',
           'shard_model_state', 'spatial_sharding']
