from physically_based_ray_tracer_tpu.parallel.mesh import make_mesh  # noqa: F401
from physically_based_ray_tracer_tpu.parallel.shard import sharded_frame  # noqa: F401
