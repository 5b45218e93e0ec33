from .sharding import make_device_mesh
