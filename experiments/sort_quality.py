"""On-chip comparison of wavefront sort keys (ops/traverse_packet.morton_order
modes) on bounce-like rays — tile coherence is the dominant cost driver of
the shared-stack Pallas traversal, so the key layout is a first-order knob.

Rays mimic a bounce-1 wavefront on the bench scene: origins sampled on the
sphere/floor surfaces, cosine-weighted directions around the surface normal.

Usage: python experiments/sort_quality.py [--lanes N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bounce_like_rays(n, seed=0):
    import numpy as np
    rng = np.random.default_rng(seed)
    # surface points: 9 spheres at the bench grid + floor
    n_s = n * 3 // 4
    centers = np.array([[dx, 0, dz] for dx in (-2.2, 0, 2.2)
                        for dz in (-2.2, 0, 2.2)], np.float32)
    c = centers[rng.integers(0, 9, n_s)]
    nrm = rng.normal(size=(n_s, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    o_s = c + nrm
    n_f = n - n_s
    o_f = np.stack([rng.uniform(-8, 8, n_f), np.full(n_f, -1.0),
                    rng.uniform(-8, 8, n_f)], axis=1).astype(np.float32)
    nf = np.tile(np.array([[0, 1, 0]], np.float32), (n_f, 1))
    o = np.concatenate([o_s, o_f])
    nrm = np.concatenate([nrm, nf])
    # cosine-weighted direction around the normal
    u = rng.random((n, 2)).astype(np.float32)
    r = np.sqrt(u[:, 0])
    phi = 2 * np.pi * u[:, 1]
    t1 = np.cross(nrm, np.where(np.abs(nrm[:, :1]) < 0.9,
                                [[1, 0, 0]], [[0, 1, 0]]))
    t1 /= np.linalg.norm(t1, axis=1, keepdims=True)
    t2 = np.cross(nrm, t1)
    d = (t1 * (r * np.cos(phi))[:, None] + t2 * (r * np.sin(phi))[:, None]
         + nrm * np.sqrt(np.maximum(1 - u[:, 0], 0.0))[:, None])
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


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
    from physically_based_ray_tracer_tpu.ops.pallas_trace import \
        sorted_closest_dense

    scene, cam, _ = build_bench_scene()
    dbvh = scene.dense
    o_np, d_np = bounce_like_rays(args.lanes)
    o, d = jnp.asarray(o_np), jnp.asarray(d_np)
    print(f"lanes={args.lanes} groups={dbvh.n_groups}")

    for mode in ("octant_major", "morton_major", "six_d"):
        f = jax.jit(lambda o, d, m=mode: sorted_closest_dense(
            dbvh, o, d, sort_mode=m).t.sum())
        float(np.asarray(f(o, d)))  # compile + warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(f(o, d)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        dt = ts[len(ts) // 2]
        print(f"  {mode:14s}: {dt * 1e3:8.2f} ms "
              f"{args.lanes / dt / 1e6:7.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
