"""jax.profiler trace of the current production frame (bf16, instanced).

Run: python experiments/profile_bf16_frame.py -> profiles/frame_r05_final/
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_bench_scene
    from physically_based_ray_tracer_tpu.config import RenderConfig
    from physically_based_ray_tracer_tpu.render.film import FilmState
    from physically_based_ray_tracer_tpu.render.renderer import frame_fn

    scene, cam, _ = build_bench_scene()   # flatten="auto" == bench
    cfg = RenderConfig(width=1280, height=720, bounces=4, antialias=True,
                       skybox=False, max_stack_depth=32, traversal="pallas",
                       one_shadow_ray=True, leaf_precision="bf16")
    n_pix = cfg.n_pixels
    pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)
    film = FilmState.zeros(n_pix)
    key = jax.random.key(0)
    frame = jax.jit(functools.partial(frame_fn, cfg=cfg))

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    film_out, avg = frame(scene, cam, film=film, key=key, sample=0,
                          pixel_ids=pixel_ids)
    sync(avg)
    t0 = time.perf_counter()
    film_out, avg = frame(scene, cam, film=film_out, key=key, sample=1,
                          pixel_ids=pixel_ids)
    sync(avg)
    print("frame ms:", round((time.perf_counter() - t0) * 1e3, 1), flush=True)

    prof_dir = os.path.join(root, "profiles", "frame_r05_final")
    os.makedirs(prof_dir, exist_ok=True)
    with jax.profiler.trace(prof_dir):
        film_out, avg = frame(scene, cam, film=film_out, key=key, sample=2,
                              pixel_ids=pixel_ids)
        sync(avg)
    print("trace written to", prof_dir, flush=True)


if __name__ == "__main__":
    main()
