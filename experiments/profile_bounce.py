"""On-chip stage breakdown of one bounce at flagship wavefront shape.

Times (slope method, experiments/devtime.py) each stage the integrator runs
per bounce at the bench chunk size: Morton sort, closest-hit kernel (sorted
and unsorted), any-hit kernel, and one full render_sample chunk. The output
directs the perf war — VERDICT round-1 #2.

Usage: python experiments/profile_bounce.py [--lanes N]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=131072)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_bench_scene
    from experiments.devtime import fetch_scalar
    from physically_based_ray_tracer_tpu.config import RenderConfig
    from physically_based_ray_tracer_tpu.ops.pallas_trace import (
        _morton_perm, intersect_any_dense, intersect_closest_dense,
        sorted_any_dense, sorted_closest_dense)
    from physically_based_ray_tracer_tpu.render.integrator import render_sample

    scene, cam, depth = build_bench_scene()
    dbvh = scene.dense
    N = args.lanes

    rng = np.random.default_rng(0)
    # bounce-like rays: origins on scene surfaces-ish, random directions
    o = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    o[:, 1] = np.abs(o[:, 1]) * 0.8
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full((N,), 1e30, jnp.float32)

    def bench_one(name, fn, iters=6):
        f = jax.jit(fn)
        fetch_scalar(f(o, d))  # compile + warm
        import time
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fetch_scalar(f(o, d))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        dt = ts[len(ts) // 2]
        print(f"  {name:28s}: {dt * 1e3:8.2f} ms  {N / dt / 1e6:8.2f} Mrays/s")
        return dt

    print(f"lanes={N}, scene groups={dbvh.n_groups}, nodes={dbvh.n_nodes}, "
          f"instances={dbvh.n_instances}")
    bench_one("closest (unsorted)",
              lambda o, d: intersect_closest_dense(dbvh, o, d).t.sum())
    bench_one("closest (morton-sorted)",
              lambda o, d: sorted_closest_dense(dbvh, o, d).t.sum())
    bench_one("anyhit (unsorted)",
              lambda o, d: intersect_any_dense(dbvh, o, d, tmax).sum())
    bench_one("anyhit (morton-sorted)",
              lambda o, d: sorted_any_dense(dbvh, o, d, tmax).sum())
    bench_one("morton perm alone",
              lambda o, d: _morton_perm(dbvh, o, d).sum())
    bench_one("morton perm + 2x argsort",
              lambda o, d: (_morton_perm(dbvh, o, d)
                            + jnp.argsort(jnp.argsort(d[:, 0]))).sum())

    # one full render_sample at the bench chunk (includes shade + NEE)
    cfg = RenderConfig(width=1280, height=720, bounces=4, antialias=True,
                       skybox=False, max_stack_depth=32, traversal="pallas")
    ids = jnp.arange(N // 2, dtype=jnp.int32)
    key = jax.random.key(0)

    def full(o, d):
        c, t = render_sample(scene, cam, cfg, key, 0, ids)
        return c.sum()

    bench_one(f"render_sample ({N // 2}px,AA)", full, iters=3)


if __name__ == "__main__":
    main()
