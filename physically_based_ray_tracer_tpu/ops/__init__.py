from physically_based_ray_tracer_tpu.ops import brdf, intersect, sampling, traverse  # noqa: F401
