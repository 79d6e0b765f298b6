from physically_based_ray_tracer_tpu.utils import image, math, rng, timer  # noqa: F401
