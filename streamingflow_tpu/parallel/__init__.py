from .mesh import make_data_parallel_step, make_mesh, shard_batch
