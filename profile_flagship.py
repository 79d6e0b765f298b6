"""Per-phase device-time profile of the flagship bench config.

Answers VERDICT r2 weak #1: where does the 1280x720 4-bounce AA frame's
time actually go? Each phase is timed at the production chunk scale
(cfg.chunk_pixels x2 AA = the live wavefront width).

Measurement method: on this environment a single jitted dispatch carries
~25-35 ms of fixed relay overhead, which swamps isolated-call timings. Each
phase is therefore measured as a SLOPE: the phase body runs K times inside
one jit (a lax.scan whose carry feeds the next iteration, defeating CSE)
and per-iteration cost = (t(K) - t(1)) / (K - 1). That is the marginal
in-frame cost of the phase — exactly what it contributes inside the real
frame program, where all phases share one dispatch.

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
  full_frame        the whole jitted frame (reference point, 1 dispatch)

Writes docs/PROFILE_r03.json.

Usage: python profile_flagship.py [--quick] [--k K]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


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


def slope(make_body, K, iters=3):
    """Marginal ms/iteration of body inside one jit via the K-vs-1 slope.

    make_body() -> (body, init) where body(carry) -> carry (same pytree
    shape); carry feeds forward so XLA cannot CSE the repeats.
    """
    import jax

    body, init = make_body()

    def repeat(n):
        @jax.jit
        def f(c):
            return jax.lax.fori_loop(0, n, lambda i, c: body(c), c)
        return f

    f1, fk = repeat(1), repeat(K)
    t1 = wall(f1, init, iters=iters)
    tk = wall(fk, init, iters=iters)
    return max((tk - t1) / (K - 1), 0.0), t1


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
    K = int(sys.argv[sys.argv.index("--k") + 1]) if "--k" in sys.argv else 8
    cfg = RenderConfig(width=1280, height=720, bounces=4, antialias=False,
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
    dn = scene.dense

    def feed(prev_t, x):
        # carry-dependent zero: forces sequential dependence, XLA keeps it
        return x + (prev_t[:x.shape[0], None] * jnp.float32(0.0)
                    if x.ndim == 2 else prev_t[:x.shape[0]] * jnp.float32(0.0))

    results = {}

    def closest_phase(fn, oo, dd):
        def mk():
            def body(c):
                h = fn(dn, feed(c, oo), dd, t_init, interpret=interp)
                return h.t
            return body, t_init
        return mk

    results["closest_sorted"], _ = slope(
        closest_phase(sorted_closest_dense, o, d), K)
    results["closest_unsorted"], _ = slope(
        closest_phase(intersect_closest_dense, o, d), K)

    # bounce-like rays: cosine-hemisphere directions from the primary hits
    f_sorted = jax.jit(functools.partial(sorted_closest_dense, interpret=interp))
    hit = f_sorted(dn, o, d, t_init)
    prim = jnp.maximum(hit.prim, 0)
    hp = o + d * jnp.where(hit.prim >= 0, hit.t, 1.0)[:, None]
    n = shading_normal(scene, prim, hit.u, hit.v, False)
    u2 = rng.uniform2(key, pixel_ids, 0, 0, Purpose.BRDF_SAMPLE)
    phi = 2 * np.pi * u2[:, 0]
    st = jnp.sqrt(u2[:, 1])
    ct = jnp.sqrt(1 - u2[:, 1])
    t1v = jnp.where(jnp.abs(n[:, 0:1]) < 0.9,
                    jnp.stack([jnp.zeros(B), -n[:, 2], n[:, 1]], -1),
                    jnp.stack([-n[:, 2], jnp.zeros(B), n[:, 0]], -1))
    t1v = t1v / jnp.maximum(jnp.linalg.norm(t1v, axis=-1, keepdims=True), 1e-9)
    t2v = jnp.cross(n, t1v)
    bd = (t1v * (jnp.cos(phi) * st)[:, None] + t2v * (jnp.sin(phi) * st)[:, None]
          + n * ct[:, None])
    bo = hp + bd * EPSILON
    bo, bd = jax.block_until_ready((bo, bd))
    results["closest_bounce"], _ = slope(
        closest_phase(sorted_closest_dense, bo, bd), K)

    # --- sort machinery alone ---------------------------------------------
    def mk_sort():
        def body(c):
            oo = feed(c[:, 0], o)
            perm = morton_order(oo, d, dn.world_lo, dn.world_hi,
                                dead=t_init <= 0.0)
            op = jnp.take(oo, perm, axis=0)
            inv = jnp.argsort(perm)
            return jnp.take(op, inv, axis=0)
        return body, o
    results["sort_only"], _ = slope(mk_sort, K)

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

    def occl_phase(fn, oo, dd, tm):
        def mk():
            def body(c):
                occ = fn(dn, feed(c, oo), dd, tm, interpret=interp)
                return occ.astype(jnp.float32)
            return body, jnp.zeros((oo.shape[0],), jnp.float32)
        return mk

    results["occl_point"], _ = slope(
        occl_phase(sorted_any_dense, so, sd, tmax_pt), K)
    results["occl_point_unsorted"], _ = slope(
        occl_phase(intersect_any_dense, so, sd, tmax_pt), K)

    ld1 = ldir[:, 0, :]
    tm1 = jnp.where(~pick_point, jnp.sqrt(dist_sq[:, 0]) - EPSILON, 0.0)
    so1 = jax.block_until_ready(hp + ld1 * EPSILON)
    results["occl_shared"], _ = slope(
        occl_phase(sorted_any_dense, so1, ld1, tm1), K)

    # --- shading -----------------------------------------------------------
    def mk_shade():
        def body(c):
            uu = hit.u + c * jnp.float32(0.0)
            mat = material_at_hit(scene, prim, uu, hit.v)
            bsdf = brdf_ops.eval_combined_brdf(n, ld1, -d, mat, cfg.brdf)
            u2 = rng.uniform2(key, pixel_ids, 0, 1, Purpose.BRDF_SAMPLE)
            bt = jnp.full((B,), brdf_ops.DIFFUSE_TYPE, jnp.int32)
            bdir, w, ok = brdf_ops.eval_indirect_combined_brdf(
                u2, n, n, -d, mat, bt, cfg.brdf)
            return (bsdf + bdir * w)[:, 0]
        return body, hit.u
    results["shade"], _ = slope(mk_shade, K)

    def mk_rng():
        def body(c):
            pid = pixel_ids + (c * jnp.float32(0.0)).astype(jnp.int32)
            tot = rng.uniform1(key, pid, 0, 0, Purpose.LIGHT_TYPE)
            tot += rng.uniform1(key, pid, 0, 0, Purpose.LIGHT_SELECT)
            tot += rng.uniform1(key, pid, 0, 0, Purpose.LOBE_SELECT)
            tot += rng.uniform1(key, pid, 0, 0, Purpose.DIELECTRIC)
            tot += jnp.sum(rng.uniform2(key, pid, 0, 0, Purpose.BRDF_SAMPLE), -1)
            return tot
        return body, jnp.zeros((B,), jnp.float32)
    results["rng"], _ = slope(mk_rng, K)

    # --- full frame (one dispatch; wall time is the honest number) ---------
    full_frame = None
    if not quick:
        cfg_f = cfg.replace(antialias=True)
        n_pix = cfg_f.n_pixels
        all_ids = jnp.arange(n_pix, dtype=jnp.int32)
        film = FilmState.zeros(n_pix)
        frame = jax.jit(functools.partial(frame_fn, cfg=cfg_f))
        full_frame = wall(
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
        "method": f"marginal slope over K={K} in-jit repeats "
                  "(isolated dispatches carry ~25-35 ms relay overhead)",
        "phases_ms_per_chunk_marginal": {k: round(v, 2)
                                         for k, v in results.items()},
        "est_ms_per_frame": {k: round(v, 1) for k, v in est_frame.items()},
        "est_total_ms": round(sum(est_frame.values()), 1),
        "full_frame_ms": full_frame and round(full_frame, 1),
        "config": {"chunk_rays": B, "n_chunks": n_chunks, "bounces": bounces,
                   "NP": NP, "backend": jax.default_backend()},
    }
    os.makedirs("docs", exist_ok=True)
    with open("docs/PROFILE_r03.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
