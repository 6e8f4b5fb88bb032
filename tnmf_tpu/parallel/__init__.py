from .sharding import DATA_AXIS, data_sharding, make_mesh, replicated, shard_model_state

__all__ = ['DATA_AXIS', 'data_sharding', 'make_mesh', 'replicated', 'shard_model_state']
