from physically_based_ray_tracer_tpu.scene.camera import Camera  # noqa: F401
from physically_based_ray_tracer_tpu.scene.lights import LightSet  # noqa: F401
from physically_based_ray_tracer_tpu.scene.scene import SceneData  # noqa: F401
