"""Per-phase device-time profile of the flagship bench config.

Answers VERDICT r2 weak #1: where do the ~3 s/frame of the 1280x720
4-bounce AA bench actually go? Each phase is timed in isolation on the real
chip at the production chunk scale (cfg.chunk_pixels pixels, x2 for AA =
the live wavefront width the frame fn runs at).

Phases
  closest_sorted    sorted closest-hit megakernel (primary-ray coherence)
  closest_unsorted  the same rays without the sort machinery
  closest_bounce    sorted closest-hit on incoherent bounce-like rays
  sort_only         morton_order + gather + inverse-argsort + gather
  occl_point        the NP-point-light flattened occlusion pass (NP*B lanes,
                    ~P_POINT live) exactly as the integrator shapes it
  occl_shared       the per-lane dir/spot occlusion pass (B lanes, ~70% live)
  shade             material fetch + combined BRDF eval + indirect sample
  rng               the per-bounce counter-RNG draws
  full_frame        the whole jitted frame (reference point)

Writes docs/PROFILE_r03.json and prints a readable table with each phase's
estimated share of a full frame (phases x bounces x chunks).

Usage: python profile_flagship.py [--quick]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def sync(x):
    import numpy as np
    import jax.numpy as jnp
    return float(np.asarray(jnp.sum(jnp.ravel(x)[:1])))


def timeit(fn, *args, iters=5, warmup=1):
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

    from bench import build_bench_scene
    from physically_based_ray_tracer_tpu.config import EPSILON, P_POINT, RenderConfig
    from physically_based_ray_tracer_tpu.ops import brdf as brdf_ops
    from physically_based_ray_tracer_tpu.ops.pallas_trace import (
        intersect_any_dense, intersect_closest_dense, sorted_any_dense,
        sorted_closest_dense)
    from physically_based_ray_tracer_tpu.ops.traverse_packet import morton_order
    from physically_based_ray_tracer_tpu.render.film import FilmState
    from physically_based_ray_tracer_tpu.render.renderer import frame_fn
    from physically_based_ray_tracer_tpu.scene.camera import primary_rays
    from physically_based_ray_tracer_tpu.scene.material import (material_at_hit,
                                                                shading_normal)
    from physically_based_ray_tracer_tpu.utils import rng
    from physically_based_ray_tracer_tpu.utils.rng import Purpose

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    quick = "--quick" in sys.argv
    cfg = RenderConfig(width=1280, height=720, bounces=4, antialias=True,
                       skybox=False, max_stack_depth=32, traversal="pallas")
    scene, cam, _depth = build_bench_scene()
    interp = jax.default_backend() not in ("tpu", "axon")

    B = cfg.chunk_pixels * 2          # AA doubles the live wavefront
    NP = int(scene.lights.n_point)
    key = jax.random.key(0)
    pixel_ids = jnp.arange(B, dtype=jnp.int32) % cfg.n_pixels
    xs = (pixel_ids % cfg.width).astype(jnp.float32)
    ys = (pixel_ids // cfg.width).astype(jnp.float32)
    o, d = primary_rays(cam, xs, ys, cfg.width, cfg.height)
    t_init = jnp.full((B,), 1e30, jnp.float32)

    results = {}

    # --- closest-hit traversal --------------------------------------------
    f_sorted = jax.jit(functools.partial(
        sorted_closest_dense, interpret=interp))
    f_unsorted = jax.jit(functools.partial(
        intersect_closest_dense, interpret=interp))
    results["closest_sorted"] = timeit(
        lambda: f_sorted(scene.dense, o, d, t_init))
    results["closest_unsorted"] = timeit(
        lambda: f_unsorted(scene.dense, o, d, t_init))

    # bounce-like rays: cosine-hemisphere directions from the primary hits
    hit = f_sorted(scene.dense, o, d, t_init)
    prim = jnp.maximum(hit.prim, 0)
    hp = o + d * jnp.where(hit.prim >= 0, hit.t, 1.0)[:, None]
    n = shading_normal(scene, prim, hit.u, hit.v, False)
    u2 = rng.uniform2(key, pixel_ids, 0, 0, Purpose.BRDF_SAMPLE)
    phi = 2 * np.pi * u2[:, 0]
    ct = jnp.sqrt(1 - u2[:, 1])
    st = jnp.sqrt(u2[:, 1])
    # crude local frame
    t1 = jnp.where(jnp.abs(n[:, 0:1]) < 0.9,
                   jnp.stack([jnp.zeros(B), -n[:, 2], n[:, 1]], -1),
                   jnp.stack([-n[:, 2], jnp.zeros(B), n[:, 0]], -1))
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    bd = (t1 * (jnp.cos(phi) * st)[:, None] + t2 * (jnp.sin(phi) * st)[:, None]
          + n * ct[:, None])
    bo = hp + bd * EPSILON
    bo, bd = jax.block_until_ready((bo, bd))
    results["closest_bounce"] = timeit(
        lambda: f_sorted(scene.dense, bo, bd, t_init))

    # --- sort machinery alone ---------------------------------------------
    def sort_only(o, d, tm):
        perm = morton_order(o, d, scene.dense.world_lo, scene.dense.world_hi,
                            dead=tm <= 0.0)
        oo = jnp.take(o, perm, axis=0)
        inv = jnp.argsort(perm)
        return jnp.take(oo, inv, axis=0)
    results["sort_only"] = timeit(jax.jit(sort_only), o, d, t_init)

    # --- occlusion passes (shaped exactly like direct_lighting) ------------
    u_pick = rng.uniform1(key, pixel_ids, 0, 0, Purpose.LIGHT_TYPE)
    pick_point = u_pick < P_POINT
    lvec = scene.lights.point_pos[None, :, :] - hp[:, None, :]
    dist_sq = jnp.sum(lvec * lvec, axis=-1)
    ldir = lvec / jnp.sqrt(jnp.maximum(dist_sq, 1e-20))[..., None]
    so = jnp.swapaxes(hp[:, None, :] + ldir * EPSILON, 0, 1).reshape(NP * B, 3)
    sd = jnp.swapaxes(ldir, 0, 1).reshape(NP * B, 3)
    tmax_pt = jnp.swapaxes(
        jnp.where(pick_point[:, None], dist_sq - EPSILON, 0.0), 0, 1
    ).reshape(NP * B)
    so, sd, tmax_pt = jax.block_until_ready((so, sd, tmax_pt))
    f_any_sorted = jax.jit(functools.partial(sorted_any_dense, interpret=interp))
    f_any = jax.jit(functools.partial(intersect_any_dense, interpret=interp))
    results["occl_point"] = timeit(
        lambda: f_any_sorted(scene.dense, so, sd, tmax_pt))
    results["occl_point_unsorted"] = timeit(
        lambda: f_any(scene.dense, so, sd, tmax_pt))

    ld1 = ldir[:, 0, :]
    tm1 = jnp.where(~pick_point, jnp.sqrt(dist_sq[:, 0]) - EPSILON, 0.0)
    results["occl_shared"] = timeit(
        lambda: f_any_sorted(scene.dense, hp + ld1 * EPSILON, ld1, tm1))

    # --- shading -----------------------------------------------------------
    def shade(prim, u, v, n, d):
        mat = material_at_hit(scene, prim, u, v)
        bsdf = brdf_ops.eval_combined_brdf(n, ld1, -d, mat, cfg.brdf)
        u2 = rng.uniform2(key, pixel_ids, 0, 1, Purpose.BRDF_SAMPLE)
        bt = jnp.full((B,), brdf_ops.DIFFUSE_TYPE, jnp.int32)
        bdir, w, ok = brdf_ops.eval_indirect_combined_brdf(
            u2, n, n, -d, mat, bt, cfg.brdf)
        return bsdf + bdir * w
    results["shade"] = timeit(jax.jit(shade), prim, hit.u, hit.v, n, d)

    def draw_rng():
        tot = rng.uniform1(key, pixel_ids, 0, 0, Purpose.LIGHT_TYPE)
        tot += rng.uniform1(key, pixel_ids, 0, 0, Purpose.LIGHT_SELECT)
        tot += rng.uniform1(key, pixel_ids, 0, 0, Purpose.LOBE_SELECT)
        tot += rng.uniform1(key, pixel_ids, 0, 0, Purpose.DIELECTRIC)
        tot += jnp.sum(rng.uniform2(key, pixel_ids, 0, 0, Purpose.BRDF_SAMPLE), -1)
        return tot
    results["rng"] = timeit(jax.jit(draw_rng))

    # --- full frame --------------------------------------------------------
    if not quick:
        n_pix = cfg.n_pixels
        all_ids = jnp.arange(n_pix, dtype=jnp.int32)
        film = FilmState.zeros(n_pix)
        frame = jax.jit(functools.partial(frame_fn, cfg=cfg))
        results["full_frame"] = timeit(
            lambda: frame(scene, cam, film=film, key=key, sample=1,
                          pixel_ids=all_ids)[1], iters=3)

    # --- report ------------------------------------------------------------
    n_chunks = -(-cfg.n_pixels // cfg.chunk_pixels)
    bounces = cfg.bounces
    est = {
        "closest (all bounces)": results["closest_sorted"]
        + results["closest_bounce"] * (bounces - 1),
        "occl_point (all bounces)": results["occl_point"] * bounces,
        "occl_shared (all bounces)": results["occl_shared"] * bounces,
        "shade+rng (all bounces)": (results["shade"] + results["rng"]) * bounces,
    }
    est_frame = {k: v * n_chunks for k, v in est.items()}
    out = {
        "phases_ms_per_chunk": {k: round(v, 2) for k, v in results.items()},
        "est_ms_per_frame": {k: round(v, 1) for k, v in est_frame.items()},
        "est_total_ms": round(sum(est_frame.values()), 1),
        "full_frame_ms": round(results.get("full_frame", float("nan")), 1),
        "config": {"chunk_rays": B, "n_chunks": n_chunks, "bounces": bounces,
                   "NP": NP, "backend": jax.default_backend()},
    }
    os.makedirs("docs", exist_ok=True)
    with open("docs/PROFILE_r03.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
