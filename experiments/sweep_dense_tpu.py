"""Dense-BVH build-parameter sweep on the real chip -> docs/SWEEP_DENSE_r03.json.

Measures the marginal (in-jit, slope-method — see profile_flagship.py) cost
of the production closest-hit megakernel over the bench scene for:
  * leaf_target in {32, 64, 128}
  * leaf shaping (shape_dense_leaves) on/off
  * world-baked single-level vs two-level TLAS (9 shared-sphere instances)

The winner sets the engine build defaults (VERDICT r2: tune leaf fill from
data, not vibes).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax
    import numpy as np
    import jax.numpy as jnp
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(jnp.sum(jnp.ravel(leaf)[:1])))


def wall(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_bench_scene
    from physically_based_ray_tracer_tpu.bvh.dense import (build_dense,
                                                           build_dense_tlas)
    from physically_based_ray_tracer_tpu.ops.pallas_trace import \
        sorted_closest_dense
    from physically_based_ray_tracer_tpu.scene.camera import primary_rays
    from physically_based_ray_tracer_tpu.scene.procedural import (make_quad,
                                                                  make_sphere)

    interp = jax.default_backend() not in ("tpu", "axon")
    scene, cam, _ = build_bench_scene()

    # raw bench geometry (world-baked soup + per-mesh for TLAS)
    sphere = make_sphere(radius=1.0, lat=32, lon=64)[0].reshape(-1, 3, 3)
    floor = make_quad([-8, -1, -8], [8, -1, -8], [8, -1, 8], [-8, -1, 8]
                      )[0].reshape(-1, 3, 3)
    offsets = [(dx, 0, dz) for dx in (-2.2, 0.0, 2.2) for dz in (-2.2, 0.0, 2.2)]
    world = np.concatenate([sphere + np.asarray(o, np.float32) for o in offsets]
                           + [floor]).astype(np.float32)

    B = 131072
    stride = (1280 * 720) // B
    ids = (jnp.arange(B, dtype=jnp.int64) * stride).astype(jnp.int32)
    xs = (ids % 1280).astype(jnp.float32)
    ys = (ids // 1280).astype(jnp.float32)
    o, d = primary_rays(cam, xs, ys, 1280, 720)
    t_init = jnp.full((B,), 1e30, jnp.float32)
    K = 8

    def measure(dn):
        def body(c):
            oo = o + c[:, None] * jnp.float32(0.0)
            h = sorted_closest_dense(dn, oo, d, t_init, interpret=interp)
            return h.t

        def repeat(n):
            @jax.jit
            def f(c):
                return jax.lax.fori_loop(0, n, lambda i, c: body(c), c)
            return f
        t1 = wall(repeat(1), t_init)
        tk = wall(repeat(K), t_init)
        return max((tk - t1) / (K - 1), 0.0)

    rows = []
    for lt in (32, 64, 128):
        for shape in (False, True):
            dn, depth = build_dense(world, leaf_target=lt, shape=shape)
            ms = measure(dn)
            rows.append({"variant": f"baked lt={lt} shape={shape}",
                         "ms_per_131072_rays": round(ms, 3),
                         "n_nodes": int(dn.n_nodes),
                         "n_groups": int(dn.n_groups), "depth": depth})
            print(rows[-1], flush=True)

    tfs = np.tile(np.eye(4, dtype=np.float32), (10, 1, 1))
    for i, off in enumerate(offsets):
        tfs[i][:3, 3] = off
    for shape in (False, True):
        dn, meta, depth = build_dense_tlas([sphere, floor],
                                           [0] * 9 + [1], tfs,
                                           leaf_target=64, shape=shape)
        ms = measure(dn)
        rows.append({"variant": f"tlas lt=64 shape={shape}",
                     "ms_per_131072_rays": round(ms, 3),
                     "n_nodes": int(dn.n_nodes),
                     "n_groups": int(dn.n_groups), "depth": depth})
        print(rows[-1], flush=True)

    out = {"method": "slope over K=8 in-jit repeats, sorted closest-hit, "
                     "bench-scene geometry, 131072 strided whole-frame rays "
                     "(59% hit fraction)",
           "rows": rows}
    docs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs")
    with open(os.path.join(docs, "SWEEP_DENSE_r03.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
