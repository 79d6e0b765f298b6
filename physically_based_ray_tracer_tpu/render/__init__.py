from physically_based_ray_tracer_tpu.render.integrator import render_sample, trace_paths  # noqa: F401
from physically_based_ray_tracer_tpu.render.renderer import Renderer  # noqa: F401
