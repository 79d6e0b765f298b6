"""Big-scene follow-up (r5): is the HBM leaf path DMA-bound at all?

The one-deep leaf queue bought only 1.07x (docs/BIG_SCENE_r05.json), so
either the DMA was already hidden or the bottleneck is node/TLAS work.
Discriminate by attempting FULL RESIDENCY: the 1M-tri scene's bf16 table
is 17.6 MB — raise VMEM_BF_GROUP_LIMIT and let the whole table live in
VMEM (no per-visit DMA at all). If that's barely faster than the queued
DMA path, the node phase is the bottleneck and further DMA work is dead.

Also measures the f32 kernel WITH its new leaf queue (job6 ran pre-queue).

Run: python experiments/big_scene_resident.py -> docs/BIG_SCENE_RESIDENT_r05.json
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax.numpy as jnp
    import numpy as np
    return float(np.asarray(jnp.sum(x)))


def wall(fn, iters=3, warmup=1):
    for _ in range(warmup):
        sync(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from physically_based_ray_tracer_tpu.models.gltf import load_gltf
    from physically_based_ray_tracer_tpu.ops import pallas_bf16 as pb
    from physically_based_ray_tracer_tpu.ops import pallas_trace as pt
    from physically_based_ray_tracer_tpu.scene.camera import Camera, primary_rays
    from physically_based_ray_tracer_tpu.scene.lights import LightSet
    from physically_based_ray_tracer_tpu.scene.scene import (
        Instance, build_scene_instanced)

    helmet = load_gltf(
        "/root/reference/assets/prefabs/models/SciFiHelmet/SciFiHelmet.gltf")
    insts = [Instance(0, position=(2.5 * (i % 7) - 7.5,
                                   2.5 * ((i // 7) % 7) - 3.75,
                                   -2.5 * (i // 49)))
             for i in range(45)]
    lights = LightSet.make(dir_pos=[[4, 6, 5]],
                           dir_color=[[2, 2, 2]]).pad_points(4)
    scene, _h, depth = build_scene_instanced([helmet], insts, lights,
                                             legacy_bvh=False)
    dn = scene.dense
    print(f"groups {dn.groups.shape[0] // 16}, bf16 table "
          f"{dn.groups_bf.nbytes / 1e6:.1f} MB, f32 table "
          f"{dn.groups.nbytes / 1e6:.1f} MB", flush=True)

    cam = Camera.make(pos=(0, 0.6, 9.0), target=(0, 0.6, 0))
    B = 131072
    ids = jnp.arange(B, dtype=jnp.int32) * ((1280 * 720) // B)
    xs = (ids % 1280).astype(jnp.float32)
    ys = (ids // 1280).astype(jnp.float32)
    o, d = primary_rays(cam, xs, ys, 1280, 720)
    t_init = jnp.full((B,), 1e30, jnp.float32)
    out = {}

    # f32 with the new leaf queue (HBM path)
    f = jax.jit(functools.partial(pt.sorted_closest_dense, interpret=False))
    ms = wall(lambda: f(dn, o, d, t_init).t)
    out["f32_queued_ms"] = round(ms, 2)
    print(f"f32 queued: {ms:.1f} ms", flush=True)

    # bf16 residency attempt (no DMA): raise the VMEM budget past the table
    try:
        old = pb.VMEM_BF_GROUP_LIMIT
        pb.VMEM_BF_GROUP_LIMIT = 4096
        f = jax.jit(functools.partial(pb.sorted_closest_bf16,
                                      interpret=False, refine="fast"))
        ms = wall(lambda: f(dn, o, d, t_init).t)
        out["bf16_resident_ms"] = round(ms, 2)
        print(f"bf16 resident: {ms:.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001 — expected if VMEM overflows
        out["bf16_resident_error"] = repr(e)[:300]
        print("bf16 resident failed:", repr(e)[:300], flush=True)
    finally:
        pb.VMEM_BF_GROUP_LIMIT = old

    out["bf16_queued_ms_job6"] = 74.8
    out["note"] = ("compare bf16_resident vs the queued 74.8 ms: a small "
                   "delta means the node/TLAS phase bounds the big scene, "
                   "not leaf DMA")
    with open(os.path.join(root, "docs", "BIG_SCENE_RESIDENT_r05.json"),
              "w") as fjson:
        json.dump(out, fjson, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
