"""jax.profiler trace of the scene1 1080p frame (BASELINE config #3)."""
import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax, jax.numpy as jnp, numpy as np
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import build_scene1
    from physically_based_ray_tracer_tpu.config import RenderConfig
    from physically_based_ray_tracer_tpu.render.film import FilmState
    from physically_based_ray_tracer_tpu.render.renderer import frame_fn
    scene, cam, depth = build_scene1()
    print("scene1 nodes:", scene.dense.nodes16.shape[0] // 16,
          "groups:", scene.dense.groups.shape[0] // 16, flush=True)
    cfg = RenderConfig(width=1920, height=1080, bounces=4, antialias=True,
                       skybox=False, max_stack_depth=max(depth + 2, 40),
                       traversal="pallas", one_shadow_ray=True,
                       leaf_precision="bf16", chunk_pixels=65536)
    n_pix = cfg.n_pixels
    ids = jnp.arange(n_pix, dtype=jnp.int32)
    film = FilmState.zeros(n_pix)
    key = jax.random.key(0)
    frame = jax.jit(functools.partial(frame_fn, cfg=cfg))
    def sync(x): return float(np.asarray(jnp.sum(x)))
    f2, avg = frame(scene, cam, film=film, key=key, sample=0, pixel_ids=ids)
    sync(avg)
    prof = os.path.join(root, "profiles", "scene1_r05")
    os.makedirs(prof, exist_ok=True)
    with jax.profiler.trace(prof):
        f2, avg = frame(scene, cam, film=f2, key=key, sample=1, pixel_ids=ids)
        sync(avg)
    print("trace written", flush=True)

if __name__ == "__main__":
    main()
