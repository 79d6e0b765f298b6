"""Calibrate the honest rays/s metric: measured live-lane fractions.

VERDICT r3 weak #3: ``ray_count`` counted ``paths x bounces`` extension
rays even though lanes die at misses, while claiming to be a lower bound.
This experiment measures, once per bench scene, the per-bounce fraction of
lanes whose extension ray is actually live and the fraction tracing a live
NEE shadow ray (the ``collect_live`` tap in ``trace_paths``), so bench.py
can report *expected live rays actually traced*.

The fractions are a property of (scene, camera, sampler), not of the
traversal backend or resolution; we estimate them on CPU at a reduced
resolution of the same camera (every lane is an iid-ish sample of the
image plane — with >2.5e4 lanes the per-bounce fraction standard error is
<0.3%). Results: docs/LIVE_RAYS_r04.json, consumed as constants by
bench.py.

Run:  JAX_PLATFORMS=cpu python experiments/live_rays.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# same aspect/camera as the 1280x720 flagship bench; 256x144 (r5) halves
# the 128x72 (r4) sub-pixel sampling bias — the r4->r5 fraction deltas are
# recorded in the artifact as the measured resolution-drift bound
# (ADVICE r4: the fractions are resolution-sensitive in principle)
W, H = 256, 144


def measure(scene, cam, cfg):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from physically_based_ray_tracer_tpu.utils import rng
    from physically_based_ray_tracer_tpu.utils.rng import Purpose
    from physically_based_ray_tracer_tpu.render.integrator import trace_paths
    from physically_based_ray_tracer_tpu.scene.camera import primary_rays

    ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    xs = (ids % cfg.width).astype(jnp.float32)
    ys = (ids // cfg.width).astype(jnp.float32)
    key = jax.random.key(0)
    o1, d1 = primary_rays(cam, xs, ys, cfg.width, cfg.height)
    if cfg.antialias:
        j = rng.uniform2(key, ids, 0, 0, Purpose.AA_JITTER)
        o2, d2 = primary_rays(cam, xs + j[:, 0], ys + j[:, 1],
                              cfg.width, cfg.height)
        o = jnp.concatenate([o1, o2])
        d = jnp.concatenate([d1, d2])
        pid = jnp.concatenate([ids, ids + cfg.n_pixels])
    else:
        o, d, pid = o1, d1, ids
    _, _, live = trace_paths(scene, cfg, o, d, pid, key, 0, collect_live=True)
    ext, shad = np.asarray(live[0]), np.asarray(live[1])
    lanes = o.shape[0]
    return (ext / lanes).tolist(), (shad / lanes).tolist(), lanes


def main():
    import bench
    from physically_based_ray_tracer_tpu.config import RenderConfig

    docs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs")
    # traversal MUST be "pallas": the bench scenes are built pallas-only
    # (legacy_bvh for spheres is off; interpret mode on CPU, same hits).
    targets = {
        "LIVE_RAYS_r05.json": (
            bench.build_bench_scene,
            "bench.build_bench_scene (9 instanced spheres + floor)", 32),
    }
    if os.path.isdir("/root/reference/assets"):
        targets["LIVE_RAYS_SCENE1_r05.json"] = (
            bench.build_scene1,
            "bench.build_scene1 (reference scene1, all 4 light types)", 40)
    for name, (builder, desc, stack) in targets.items():
        prev_path = os.path.join(docs, name.replace("r05", "r04"))
        prev = None
        if os.path.exists(prev_path):
            with open(prev_path) as f:
                prev = json.load(f)
        scene, cam, depth = builder()
        cfg = RenderConfig(width=W, height=H, bounces=4, antialias=True,
                           skybox=False, max_stack_depth=stack,
                           traversal="pallas", one_shadow_ray=True)
        ext_f, shad_f, lanes = measure(scene, cam, cfg)
        out = {
            "what": "per-bounce live-lane fractions (fraction of AA-doubled "
                    "path lanes whose extension / NEE shadow ray is actually "
                    "traced, vs lane-slots launched)",
            "scene": desc,
            "cfg": {"bounces": 4, "antialias": True, "skybox": False,
                    "one_shadow_ray": True},
            "measured_at": f"{W}x{H} on CPU, {lanes} lanes",
            "extension_live_fraction": [round(f, 4) for f in ext_f],
            "shadow_live_fraction": [round(f, 4) for f in shad_f],
            "honest_ray_factor": round(
                (sum(ext_f) + sum(shad_f)) / (2.0 * len(ext_f)), 4),
            "note": "honest rays/frame = lanes*(sum(ext)+sum(shadow)) vs "
                    "the old count lanes*2*bounces",
        }
        if prev is not None:
            out["resolution_drift_vs_128x72"] = [
                round(a - b, 4) for a, b in
                zip(ext_f + shad_f, prev["extension_live_fraction"]
                    + prev["shadow_live_fraction"])]
        with open(os.path.join(docs, name), "w") as f:
            json.dump(out, f, indent=1)
        print(name, json.dumps(out["extension_live_fraction"]),
              json.dumps(out["shadow_live_fraction"]), flush=True)


if __name__ == "__main__":
    main()
