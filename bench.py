"""Throughput benchmark: Mrays/s on the real chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The metric is true rays/s (primary + AA + shadow + bounce rays actually
traced), not the reference's pixels/ms readout (Core/Renderer.cpp:473,
SURVEY.md §6). Baseline for vs_baseline is the BASELINE.json north-star
target of 500 Mrays/s/chip at a 4-bounce path trace.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MRAYS = 500.0  # BASELINE.json: >500 Mrays/s/chip at 4-bounce


def build_bench_scene(dense_leaf_target: int = 16, flatten: str = "auto"):
    from physically_based_ray_tracer_tpu.scene.camera import Camera
    from physically_based_ray_tracer_tpu.scene.lights import LightSet
    from physically_based_ray_tracer_tpu.scene.procedural import make_quad, make_sphere
    from physically_based_ray_tracer_tpu.scene.scene import (Instance, MeshModel,
                                                             build_scene_instanced)

    sphere = MeshModel.from_fat(make_sphere(radius=1.0, lat=32, lon=64),
                                base_color=(0.8, 0.3, 0.2), roughness=0.4, metalness=0.2)
    floor = MeshModel.from_fat(
        make_quad([-8, -1, -8], [8, -1, -8], [8, -1, 8], [-8, -1, 8]),
        base_color=(0.6, 0.6, 0.6), roughness=0.8)
    lights = LightSet.make(
        point_pos=[[2, 3, 2], [-2, 3, -1], [0, 5, 0], [3, 2, -3]],
        point_color=[[20, 20, 20], [10, 12, 14], [6, 6, 6], [8, 4, 2]],
        dir_pos=[[5, 8, 3]], dir_color=[[1.5, 1.4, 1.2]],
        spot_pos=[[0, 4, 0]], spot_color=[[8, 8, 8]], spot_rot=[[0, -1, 0]],
    )
    instances = [Instance(0, position=(dx, 0, dz))
                 for dx in (-2.2, 0.0, 2.2) for dz in (-2.2, 0.0, 2.2)]
    instances.append(Instance(1))
    # scene-adaptive layout (r5): instanced build with flatten="auto" — the
    # engine world-bakes this small static scene into ONE single-level tree
    # (10 instances, 38k world tris; two-level TLAS re-entry cost removed),
    # exactly what it would do for any static scene under the budget caps
    scene, _handle, depth = build_scene_instanced(
        [sphere, floor], instances, lights, legacy_bvh=False,
        dense_leaf_target=dense_leaf_target, flatten=flatten)
    cam = Camera.make(pos=(0, 2.5, 7), target=(0, 0, 0))
    return scene, cam, depth


# Ray accounting: expected LIVE rays actually traced, from per-bounce
# live-lane fractions measured once per scene with the integrator's
# collect_live tap (experiments/live_rays.py -> docs/LIVE_RAYS_r04.json).
# Falls back to the lane-slot upper bound (utils/timer.ray_count) with a
# note if the calibration artifact is missing.


def load_live_fractions(which="spheres"):
    base = "LIVE_RAYS" if which == "spheres" else "LIVE_RAYS_SCENE1"
    docs = os.path.join(os.path.dirname(os.path.abspath(__file__)), "docs")
    path = None
    for rev in ("r05", "r04"):   # prefer the freshest calibration
        cand = os.path.join(docs, f"{base}_{rev}.json")
        if os.path.exists(cand):
            path = cand
            break
    if path is None:
        return None
    with open(path) as f:
        d = json.load(f)
    return (d["extension_live_fraction"], d["shadow_live_fraction"],
            d.get("measured_at", "unknown"))


def build_scene1(width=1920, height=1080):
    """BASELINE config #3: the real scene1 assets (SciFiHelmet + scene
    JSON lights) with ALL FOUR light types at full 1080p — the capture
    configuration of Core/Renderer.cpp:437-465 at the editor window's
    aspect (template/common.h:8-9 scaled to 1080p)."""
    import numpy as np
    from physically_based_ray_tracer_tpu.scene.lights import LightSet
    from physically_based_ray_tracer_tpu.scene.loader import load_reference_scene

    scene, cam, depth = load_reference_scene("/root/reference/assets")
    L = scene.lights
    lights = LightSet.make(
        point_pos=[[2, 2, 2], [-2, 2, -1], [0, 3, 0], [2, 1, -2]],
        point_color=[[6, 6, 6], [3, 4, 5], [2, 2, 2], [3, 1, 1]],
        dir_pos=np.array(L.dir_pos), dir_color=np.array(L.dir_color),
        spot_pos=np.array(L.spot_pos), spot_color=np.array(L.spot_color),
        spot_rot=np.array(L.spot_rot),
        area_pos=[[0.0, 2.5, 0.0]], area_color=[[6.0, 5.0, 3.0]],
        area_u=[[0.5, 0.0, 0.0]], area_v=[[0.0, 0.0, 0.5]])
    return scene._replace(lights=lights), cam, depth


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from physically_based_ray_tracer_tpu.config import RenderConfig
    from physically_based_ray_tracer_tpu.render.film import FilmState
    from physically_based_ray_tracer_tpu.render.renderer import frame_fn
    from physically_based_ray_tracer_tpu.utils.timer import ray_count
    import functools

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    which = "scene1" if "--scene" in sys.argv and         sys.argv[sys.argv.index("--scene") + 1] == "scene1" else "spheres"
    chunk = (int(sys.argv[sys.argv.index("--chunk") + 1])
             if "--chunk" in sys.argv else 65536)
    lt = (int(sys.argv[sys.argv.index("--lt") + 1])
          if "--lt" in sys.argv else 16)
    # headline default = the production engine (bf16 sweeps; r5 VERDICT #4)
    precision = "f32" if "--f32" in sys.argv else "bf16"
    shade_tile = (int(sys.argv[sys.argv.index("--shade-tile") + 1])
                  if "--shade-tile" in sys.argv else 0)
    # --exact-shadow: bound point-light shadow rays at the light (the
    # physical mode) instead of the reference's tmax = dist^2 quirk
    # (Core/Renderer.cpp:257) that traverses far past it — measures the
    # quirk's traversal tax (docs/PERF_LOG.md)
    exact_shadow = "--exact-shadow" in sys.argv

    # one_shadow_ray: the single-lane point-NEE estimator (converges to the
    # physically-consistent per-light sum; converged delta vs the reference
    # quirk estimator is on record in docs/ONE_SHADOW.json) — it removes the
    # NP*B occlusion pass that profiling showed was 74% of the frame
    # (docs/PROFILE_r03.json).
    if which == "scene1":
        scene, cam, depth = build_scene1()
        cfg = RenderConfig(width=1920, height=1080, bounces=4, antialias=True,
                           skybox=False, max_stack_depth=max(depth + 2, 40),
                           traversal="pallas", one_shadow_ray=True,
                           leaf_precision=precision, chunk_pixels=chunk,
                           shade_tile=shade_tile,
                           exact_shadow_tmax=exact_shadow)
    else:
        # --no-flatten: force the two-level TLAS layout; --flatten: force
        # world-baked even past the auto policy's fast-memory budgets
        flat = ("auto" if "--flatten" not in sys.argv else True)
        if "--no-flatten" in sys.argv:
            flat = False
        scene, cam, depth = build_bench_scene(dense_leaf_target=lt,
                                              flatten=flat)
        cfg = RenderConfig(width=1280, height=720, bounces=4, antialias=True,
                           skybox=False, max_stack_depth=32,
                           traversal="pallas", one_shadow_ray=True,
                           leaf_precision=precision, chunk_pixels=chunk,
                           shade_tile=shade_tile,
                           exact_shadow_tmax=exact_shadow)

    n_pix = cfg.n_pixels
    pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)
    film = FilmState.zeros(n_pix)
    key = jax.random.key(0)
    frame = jax.jit(functools.partial(frame_fn, cfg=cfg))

    def sync(x):
        # block_until_ready does not actually block over the axon relay —
        # the only reliable device sync is a device->host scalar fetch.
        return float(np.asarray(jnp.sum(x)))

    # warmup/compile
    film_out, avg = frame(scene, cam, film=film, key=key, sample=0,
                          pixel_ids=pixel_ids)
    sync(avg)

    iters = 3
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        film_out, avg = frame(scene, cam, film=film_out, key=key,
                              sample=i + 1, pixel_ids=pixel_ids)
        sync(avg)
        times.append(time.perf_counter() - t0)
    times.sort()
    t_med = times[len(times) // 2]

    frac = load_live_fractions(which)
    calibration = None
    if frac is not None:
        from physically_based_ray_tracer_tpu.utils.timer import live_ray_count
        rays = live_ray_count(cfg, n_pix, frac[0], frac[1])
        calibration = frac[2]
        counted = ("expected LIVE rays actually traced (primary + AA + live "
                   "bounce extensions + live NEE shadow rays; dead lanes "
                   "excluded), per-bounce live fractions measured by "
                   "experiments/live_rays.py")
    else:
        rays = ray_count(cfg, n_pix, n_point_lights=int(scene.lights.n_point))
        counted = "lane-slots launched (upper bound; calibration missing)"
    mrays = rays / t_med / 1e6
    # lane-slot equivalent: the r1-r3 accounting (paths x bounces
    # extension slots + live shadow), for cross-round trajectory
    # comparability — NOT the headline (it over-counts dead lanes)
    slots = ray_count(cfg, n_pix, n_point_lights=int(scene.lights.n_point))
    label = ("scene1 1920x1080" if which == "scene1" else "1280x720")
    # standing BENCH field (VERDICT r4 #7): the honest Mrays/s of BASELINE
    # config #3 (scene1 at 1080p), measured by `bench.py --scene scene1`
    # this round and recorded in docs/SCENE1_1080P_r05.json
    extra = {}
    if which != "scene1":
        s1 = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "docs", "SCENE1_1080P_r05.json")
        if os.path.exists(s1):
            with open(s1) as f:
                d1 = json.load(f)
            extra["scene1_honest_mrays"] = d1.get("value")
            extra["scene1_frame_ms"] = d1.get("frame_ms")
    print(json.dumps({
        "metric": f"Mrays/s/chip ({label}, 4-bounce path trace, NEE, AA, "
                  f"leaf_precision={precision})",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "counted": counted,
        "live_fraction_calibration": calibration,
        "frame_ms": round(t_med * 1e3, 1),
        "lane_slot_equivalent_mrays": round(slots / t_med / 1e6, 2),
        "lane_slot_note": "r1-r3 BENCH files used this looser accounting",
        **extra,
    }))


if __name__ == "__main__":
    main()
