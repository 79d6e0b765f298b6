"""On-chip frame-config sweep: dense leaf size x chunk size x sort.

Directs the perf war (VERDICT round-1 #2): each config times one full
512x512 4-bounce frame on the bench scene. Compile is slow over the remote
compile service — run in background, results append to stdout as they come.

Usage: python experiments/sweep_frame.py
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

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_bench_scene
    from physically_based_ray_tracer_tpu.config import RenderConfig
    from physically_based_ray_tracer_tpu.render.film import FilmState
    from physically_based_ray_tracer_tpu.render.renderer import frame_fn
    from physically_based_ray_tracer_tpu.scene.scene import build_scene
    from physically_based_ray_tracer_tpu.utils.timer import ray_count
    import bench as bench_mod

    def build(leaf_target):
        # rebuild the bench scene with a given dense leaf target
        import physically_based_ray_tracer_tpu.scene.scene as sc
        from physically_based_ray_tracer_tpu.scene.camera import Camera
        from physically_based_ray_tracer_tpu.scene.lights import LightSet
        from physically_based_ray_tracer_tpu.scene.procedural import (
            make_quad, make_sphere)
        from physically_based_ray_tracer_tpu.scene.scene import (Instance,
                                                                 MeshModel)
        sphere = MeshModel.from_fat(make_sphere(radius=1.0, lat=32, lon=64),
                                    base_color=(0.8, 0.3, 0.2), roughness=0.4,
                                    metalness=0.2)
        floor = MeshModel.from_fat(
            make_quad([-8, -1, -8], [8, -1, -8], [8, -1, 8], [-8, -1, 8]),
            base_color=(0.6, 0.6, 0.6), roughness=0.8)
        lights = LightSet.make(
            point_pos=[[2, 3, 2], [-2, 3, -1], [0, 5, 0], [3, 2, -3]],
            point_color=[[20, 20, 20], [10, 12, 14], [6, 6, 6], [8, 4, 2]],
            dir_pos=[[5, 8, 3]], dir_color=[[1.5, 1.4, 1.2]],
            spot_pos=[[0, 4, 0]], spot_color=[[8, 8, 8]], spot_rot=[[0, -1, 0]])
        instances = [Instance(0, position=(dx, 0, dz))
                     for dx in (-2.2, 0.0, 2.2) for dz in (-2.2, 0.0, 2.2)]
        instances.append(Instance(1))
        scene, depth = build_scene([sphere, floor], instances, lights,
                                   dense_leaf_target=leaf_target)
        cam = Camera.make(pos=(0, 2.5, 7), target=(0, 0, 0))
        return scene, cam

    def run(label, scene, cam, **kw):
        base = dict(width=512, height=512, bounces=4, antialias=True,
                    skybox=False, max_stack_depth=32, traversal="pallas")
        base.update(kw)
        cfg = RenderConfig(**base)
        n_pix = cfg.n_pixels
        ids = jnp.arange(n_pix, dtype=jnp.int32)
        film = FilmState.zeros(n_pix)
        key = jax.random.key(0)
        frame = jax.jit(functools.partial(frame_fn, cfg=cfg))
        t_c0 = time.perf_counter()
        out = frame(scene, cam, film=film, key=key, sample=0, pixel_ids=ids)
        float(np.asarray(jnp.sum(out[1])))
        compile_s = time.perf_counter() - t_c0
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            out = frame(scene, cam, film=out[0],
                        key=jax.random.fold_in(key, i), sample=i + 1,
                        pixel_ids=ids)
            float(np.asarray(jnp.sum(out[1])))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        dt = ts[len(ts) // 2]
        rays = ray_count(cfg, n_pix)
        print(f"{label:42s}: {dt * 1e3:9.1f} ms  {rays / dt / 1e6:7.2f} Mrays/s"
              f"  (compile+warm {compile_s:.0f}s)", flush=True)

    for leaf in (64, 32, 16):
        scene, cam = build(leaf)
        g = scene.dense.n_groups
        run(f"leaf={leaf} (groups={g}) chunk=64k", scene, cam)
        if leaf == 32:
            run(f"leaf={leaf} chunk=256k", scene, cam, chunk_pixels=262144)
            run(f"leaf={leaf} chunk=64k nosort", scene, cam, sort_rays=False)
            run(f"leaf={leaf} chunk=64k 1shadow", scene, cam,
                one_shadow_ray=True)


if __name__ == "__main__":
    main()
