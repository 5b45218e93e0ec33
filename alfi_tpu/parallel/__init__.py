from .sharding import make_device_mesh, shard_solver_arrays
