"""Quantify the sub-tile shade-gate opportunity (r5, VERDICT #1 follow-up).

The shade/NEE elementwise block runs full-width although 57% of
lane-bounces are dead (docs/LIVE_RAYS_r05). Chunks are contiguous Morton
ranges, so contiguous W-lane sub-tiles are square screen blocks — if dead
lanes cluster spatially, gating each sub-tile with a scalar any() skips
most of the dead work WITHOUT a compaction sort.

This measures, per bounce, for several sub-tile widths W:
  - frac of sub-tiles with NO alive lane  (full skip: nothing to do)
  - frac of sub-tiles with NO found lane  (skip_shade: sky bookkeeping only)
  - the compaction upper bound: 1 - ceil(live/W)/(B/W) if lanes were
    sorted live-first
on the flagship bench scene camera at a reduced resolution (spatial
clustering is resolution-robust at fixed relative block size).

Run:  JAX_PLATFORMS=cpu python experiments/subtile_deadness.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

W_RES, H_RES = 640, 360
CHUNKS = 4          # ~57600 px/chunk -> B=115200 lanes with AA (bench: 122880)
WIDTHS = [2048, 4096, 8192, 16384]


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")   # the axon plugin ignores env
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/pbrt_tpu_jax_cache")

    from bench import build_bench_scene
    from physically_based_ray_tracer_tpu.config import RenderConfig
    from physically_based_ray_tracer_tpu.render.integrator import trace_paths
    from physically_based_ray_tracer_tpu.render.renderer import morton_pixel_order
    from physically_based_ray_tracer_tpu.scene.camera import Camera, primary_rays
    from physically_based_ray_tracer_tpu.utils import rng
    from physically_based_ray_tracer_tpu.utils.rng import Purpose

    scene, cam, depth = build_bench_scene()
    cfg = RenderConfig(width=W_RES, height=H_RES, bounces=4, antialias=True,
                       max_stack_depth=max(depth + 2, 40),
                       leaf_precision="f32")  # masks only; engine-agnostic
    ids_all = morton_pixel_order(W_RES, H_RES)
    n = ids_all.shape[0]
    per = -(-n // CHUNKS)
    key = jax.random.key(0)

    # per (bounce, W): [n_subtiles, n_dead_subtiles, n_nofound_subtiles]
    stats = {b: {w: [0, 0, 0] for w in WIDTHS} for b in range(cfg.bounces)}
    live_lane_counts = np.zeros(cfg.bounces)
    found_lane_counts = np.zeros(cfg.bounces)
    total_lanes = 0

    for c in range(CHUNKS):
        pix = jnp.asarray(ids_all[c * per:(c + 1) * per])
        xs = (pix % cfg.width).astype(jnp.float32)
        ys = (pix // cfg.width).astype(jnp.float32)
        o1, d1 = primary_rays(cam, xs, ys, cfg.width, cfg.height)
        j = rng.uniform2(key, pix, 0, 0, Purpose.AA_JITTER)
        o2, d2 = primary_rays(cam, xs + j[:, 0], ys + j[:, 1],
                              cfg.width, cfg.height)
        o = jnp.concatenate([o1, o2])
        d = jnp.concatenate([d1, d2])
        pid = jnp.concatenate([pix, pix + cfg.n_pixels])
        _, _, dbg = trace_paths(scene, cfg, o, d, pid, key, 0,
                                collect_debug=True)
        alive_out = np.asarray(dbg["alive_out"])          # (bounces, B)
        found = np.asarray(dbg["hit_prim"]) >= 0          # (bounces, B)
        B = alive_out.shape[1]
        total_lanes += B
        for b in range(cfg.bounces):
            alive_in = np.ones(B, bool) if b == 0 else alive_out[b - 1]
            live_lane_counts[b] += alive_in.sum()
            found_lane_counts[b] += (alive_in & found[b]).sum()
            for w in WIDTHS:
                nt = B // w
                a = alive_in[:nt * w].reshape(nt, w)
                f = (alive_in & found[b])[:nt * w].reshape(nt, w)
                stats[b][w][0] += nt
                stats[b][w][1] += int((~a.any(axis=1)).sum())
                stats[b][w][2] += int((~f.any(axis=1)).sum())

    out = {"resolution": [W_RES, H_RES], "chunks": CHUNKS,
           "lanes_total": int(total_lanes), "per_bounce": []}
    for b in range(cfg.bounces):
        lf = live_lane_counts[b] / total_lanes
        ff = found_lane_counts[b] / total_lanes
        row = {"bounce": b, "live_frac": round(float(lf), 4),
               "found_frac": round(float(ff), 4), "widths": {}}
        for w in WIDTHS:
            nt, dead, nofound = stats[b][w]
            # compaction bound: sorted live-first, ceil(live*nt)/nt subtiles live
            comp = 1.0 - min(1.0, np.ceil(lf * nt) / nt)
            row["widths"][w] = {
                "dead_subtile_frac": round(dead / nt, 4),
                "nofound_subtile_frac": round(nofound / nt, 4),
                "compaction_bound_dead_frac": round(float(comp), 4)}
        out["per_bounce"].append(row)

    # headline: average over bounces of skippable fraction (shade cost is
    # per-bounce uniform) for each W, vs the compaction bound
    for w in WIDTHS:
        sk = np.mean([out["per_bounce"][b]["widths"][w]["nofound_subtile_frac"]
                      for b in range(cfg.bounces)])
        cb = np.mean([out["per_bounce"][b]["widths"][w]["compaction_bound_dead_frac"]
                      for b in range(cfg.bounces)])
        out.setdefault("summary", {})[w] = {
            "avg_shade_skippable": round(float(sk), 4),
            "avg_compaction_bound": round(float(cb), 4)}
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "SUBTILE_DEADNESS_r05.json"),
            "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
