from physically_based_ray_tracer_tpu.models.gltf import load_gltf  # noqa: F401
from physically_based_ray_tracer_tpu.models.resources import ResourceManager  # noqa: F401
