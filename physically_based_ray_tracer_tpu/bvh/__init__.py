from physically_based_ray_tracer_tpu.bvh.types import BVHArrays  # noqa: F401
from physically_based_ray_tracer_tpu.bvh.builder import build_bvh  # noqa: F401
