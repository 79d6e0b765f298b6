"""bf16 small-tile megakernel vs f32 shared-stack kernel on the real chip.

1. SEMANTICS: the compiled bf16 kernel must agree with its own interpret
   mode (bitcast rolls, pltpu.repeat, arithmetic masks all lower through
   Mosaic here) — any disagreement is a lowering bug, not precision.
2. SPEED: slope-timed on the production bench scene for the three
   wavefront classes (strided primaries / sampled bounces / shadow rays),
   same harness as rows_vs_shared_tpu.py. -> docs/BF16_VS_F32_r04.json
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
    return float(np.asarray(jnp.sum(jnp.ravel(leaf)[:1].astype(jnp.float32))))


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


def slope_of(body, init, K=8):
    import jax

    def repeat(n):
        @jax.jit
        def f(c):
            return jax.lax.fori_loop(0, n, lambda i, c: body(c), c)
        return f
    t1 = wall(repeat(1), init)
    tk = wall(repeat(K), init)
    return max((tk - t1) / (K - 1), 0.0)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_bench_scene
    from physically_based_ray_tracer_tpu.config import EPSILON
    from physically_based_ray_tracer_tpu.ops.pallas_bf16 import (
        intersect_any_bf16, intersect_closest_bf16, sorted_any_bf16,
        sorted_closest_bf16)
    from physically_based_ray_tracer_tpu.ops.pallas_trace import (
        sorted_any_dense, sorted_closest_dense)
    from physically_based_ray_tracer_tpu.scene.camera import primary_rays
    from physically_based_ray_tracer_tpu.scene.material import shading_normal
    from physically_based_ray_tracer_tpu.utils import rng
    from physically_based_ray_tracer_tpu.utils.rng import Purpose

    interp = jax.default_backend() not in ("tpu", "axon")
    print(f"backend={jax.default_backend()} interpret={interp}", flush=True)
    scene, cam, _ = build_bench_scene()
    dn = scene.dense
    out = {}

    # --- 1. compiled-vs-interpret semantics on a small batch ---------------
    Bs = 4096
    idss = (jnp.arange(Bs, dtype=jnp.int64) * ((1280 * 720) // Bs)
            ).astype(jnp.int32)
    xs = (idss % 1280).astype(jnp.float32)
    ys = (idss // 1280).astype(jnp.float32)
    os_, ds_ = primary_rays(cam, xs, ys, 1280, 720)
    ts_ = jnp.full((Bs,), 1e30, jnp.float32)
    if not interp:
        hc = jax.jit(functools.partial(intersect_closest_bf16,
                                       interpret=False))(dn, os_, ds_, ts_)
        hi = intersect_closest_bf16(dn, os_, ds_, ts_, interpret=True)
        agree = float(np.mean(np.asarray(hc.prim) == np.asarray(hi.prim)))
        dt = float(np.nanmax(np.abs(np.where(
            np.asarray(hc.prim) == np.asarray(hi.prim),
            np.asarray(hc.t) - np.asarray(hi.t), 0.0))))
        out["semantics_prim_agree_compiled_vs_interpret"] = round(agree, 5)
        out["semantics_t_maxabs_same_prim"] = dt
        print(f"compiled-vs-interpret: prim agree {agree:.5f}, "
              f"t maxabs {dt:.3e}", flush=True)
        oc = jax.jit(functools.partial(intersect_any_bf16,
                                       interpret=False))(
            dn, os_, ds_, jnp.full((Bs,), 8.0, jnp.float32))
        oi = intersect_any_bf16(dn, os_, ds_,
                                jnp.full((Bs,), 8.0, jnp.float32),
                                interpret=True)
        aocc = float(np.mean(np.asarray(oc) == np.asarray(oi)))
        out["semantics_occl_agree"] = round(aocc, 5)
        print(f"occl compiled-vs-interpret agree {aocc:.5f}", flush=True)

    # --- 2. slope timings on the three wavefront classes -------------------
    B = 131072
    stride = (1280 * 720) // B
    ids = (jnp.arange(B, dtype=jnp.int64) * stride).astype(jnp.int32)
    xs = (ids % 1280).astype(jnp.float32)
    ys = (ids // 1280).astype(jnp.float32)
    o, d = primary_rays(cam, xs, ys, 1280, 720)
    t_init = jnp.full((B,), 1e30, jnp.float32)

    f0 = jax.jit(functools.partial(sorted_closest_dense, interpret=interp))
    hit = f0(dn, o, d, t_init)
    prim = jnp.maximum(hit.prim, 0)
    alive = hit.prim >= 0
    hp = o + d * jnp.where(alive, hit.t, 1.0)[:, None]
    n = shading_normal(scene, prim, hit.u, hit.v, False)
    u2 = rng.uniform2(jax.random.key(0), ids, 0, 0, Purpose.BRDF_SAMPLE)
    phi = 2 * np.pi * u2[:, 0]
    st = jnp.sqrt(u2[:, 1])
    ct = jnp.sqrt(1 - u2[:, 1])
    t1v = jnp.where(jnp.abs(n[:, 0:1]) < 0.9,
                    jnp.stack([jnp.zeros(B), -n[:, 2], n[:, 1]], -1),
                    jnp.stack([-n[:, 2], jnp.zeros(B), n[:, 0]], -1))
    t1v = t1v / jnp.maximum(jnp.linalg.norm(t1v, axis=-1, keepdims=True), 1e-9)
    t2v = jnp.cross(n, t1v)
    bd = (t1v * (jnp.cos(phi) * st)[:, None]
          + t2v * (jnp.sin(phi) * st)[:, None] + n * ct[:, None])
    bo = hp + bd * EPSILON
    bt = jnp.where(alive, 1e30, 0.0)
    lvec = scene.lights.point_pos[0][None] - hp
    dist = jnp.sqrt(jnp.maximum(jnp.sum(lvec * lvec, -1), 1e-20))
    ld = lvec / dist[:, None]
    so = hp + ld * EPSILON
    stm = jnp.where(alive, dist * dist - EPSILON, 0.0)
    bo, bd, bt, so, ld, stm = jax.block_until_ready((bo, bd, bt, so, ld, stm))

    def closest_body(fn, oo, dd, tm):
        def body(c):
            h = fn(dn, oo + c[:, None] * jnp.float32(0.0), dd, tm,
                   interpret=interp)
            return h.t
        return body

    def any_body(fn, oo, dd, tm):
        def body(c):
            occ = fn(dn, oo + c[:, None] * jnp.float32(0.0), dd, tm,
                     interpret=interp)
            return occ.astype(jnp.float32)
        return body

    import functools as _ft
    sorted_closest_bf16_fast = _ft.partial(sorted_closest_bf16,
                                           refine="fast")
    cases = [
        ("primary_closest", closest_body, o, d, t_init,
         sorted_closest_dense, sorted_closest_bf16_fast),
        ("bounce_closest", closest_body, bo, bd, bt,
         sorted_closest_dense, sorted_closest_bf16_fast),
        ("shadow_any", any_body, so, ld, stm,
         sorted_any_dense, sorted_any_bf16),
    ]
    for name, mk, oo, dd, tm, f32fn, bf16fn in cases:
        z = jnp.zeros((B,), jnp.float32)
        a = slope_of(mk(f32fn, oo, dd, tm), z)
        b = slope_of(mk(bf16fn, oo, dd, tm), z)
        out[f"{name}_f32_ms"] = round(a, 3)
        out[f"{name}_bf16_ms"] = round(b, 3)
        out[f"{name}_speedup"] = round(a / max(b, 1e-9), 2)
        print(f"{name}: f32 {a:.2f} ms -> bf16 {b:.2f} ms "
              f"({a / max(b, 1e-9):.2f}x)", flush=True)

    docs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs")
    with open(os.path.join(docs, "BF16_VS_F32_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
