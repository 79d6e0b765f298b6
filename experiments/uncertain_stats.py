"""Quantify the occlusion rerun's drivers: per-bounce fraction of shadow
lanes flagged apron-UNCERTAIN by the bf16 any kernel, and how many
sorted 1024-ray tiles contain at least one (each such tile pays a
traversal in the exact-f32 resolve pass; PERF_LOG r5.13).

Run:  python experiments/uncertain_stats.py   (CPU, reduced res)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W_RES, H_RES = 320, 180


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/pbrt_tpu_jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from bench import build_bench_scene
    from physically_based_ray_tracer_tpu.config import RenderConfig
    import physically_based_ray_tracer_tpu.render.integrator as integ
    from physically_based_ray_tracer_tpu.ops import pallas_bf16 as pb
    from physically_based_ray_tracer_tpu.render.renderer import morton_pixel_order
    from physically_based_ray_tracer_tpu.scene.camera import primary_rays
    from physically_based_ray_tracer_tpu.utils import rng
    from physically_based_ray_tracer_tpu.utils.rng import Purpose

    scene, cam, depth = build_bench_scene()
    cfg = RenderConfig(width=W_RES, height=H_RES, bounces=4, antialias=True,
                       one_shadow_ray=True, skybox=False,
                       max_stack_depth=max(depth + 2, 40))

    batches = []
    orig = integ._anyhit

    def spy(accel, c, o, d, t_max, sort=False):
        batches.append((np.asarray(o), np.asarray(d), np.asarray(t_max)))
        return orig(accel, c, o, d, t_max, sort=sort)

    integ._anyhit = spy
    ids = jnp.asarray(morton_pixel_order(W_RES, H_RES))
    xs = (ids % W_RES).astype(jnp.float32)
    ys = (ids // W_RES).astype(jnp.float32)
    key = jax.random.key(0)
    o1, d1 = primary_rays(cam, xs, ys, W_RES, H_RES)
    j = rng.uniform2(key, ids, 0, 0, Purpose.AA_JITTER)
    o2, d2 = primary_rays(cam, xs + j[:, 0], ys + j[:, 1], W_RES, H_RES)
    o = jnp.concatenate([o1, o2])
    d = jnp.concatenate([d1, d2])
    pid = jnp.concatenate([ids, ids + cfg.n_pixels])
    with jax.disable_jit():
        integ.trace_paths(scene, cfg, o, d, pid, key, 0)
    integ._anyhit = orig

    rows = []
    for b, (so, sd, tm) in enumerate(batches):
        idx_s, comps, tms = pb._cosort_rays(scene.dense, jnp.asarray(so),
                                            jnp.asarray(sd), jnp.asarray(tm),
                                            "octant_major")
        t, gk, _ = pb._call_bf16(scene.dense, None, None, tms, closest=False,
                                 interpret=True, components=comps)
        cert = np.asarray(t) > 0.5
        unc = np.asarray(gk) > 0
        need = unc & ~cert
        live = np.asarray(tms) > 0
        n_tiles = -(-need.shape[0] // 1024)
        tiles_need = sum(need[i * 1024:(i + 1) * 1024].any()
                         for i in range(n_tiles))
        rows.append(dict(
            bounce=b, lanes=int(need.shape[0]), live=int(live.sum()),
            certain_frac_of_live=round(float(cert.sum() / max(live.sum(), 1)), 4),
            uncertain_unresolved_frac_of_live=round(
                float(need.sum() / max(live.sum(), 1)), 4),
            tiles=n_tiles, tiles_with_need=int(tiles_need)))
        print(rows[-1])

    out = dict(resolution=[W_RES, H_RES], note=(
        "per-(bounce) shadow batch: certain = occluded in-kernel; "
        "uncertain_unresolved lanes trigger the exact-f32 resolve; "
        "tiles_with_need ~ the resolve pass's traversal cost driver"),
        batches=rows)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs",
            "UNCERTAIN_STATS_r05.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("written docs/UNCERTAIN_STATS_r05.json")


if __name__ == "__main__":
    main()
