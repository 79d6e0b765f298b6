"""Row-parallel vs shared-stack megakernel on the real chip.

Slope-timed (see profile_flagship.py) on the production bench scene
(two-level TLAS, lt=32 shaped) for the two ray classes that dominate the
frame: strided whole-frame primaries and incoherent bounce rays, plus the
shadow-occlusion shapes. Also microbenchmarks the raw MT roll sweep to
locate the VPU ILP ceiling. -> docs/ROWS_VS_SHARED_r03.json
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_bench_scene
    from physically_based_ray_tracer_tpu.config import EPSILON
    from physically_based_ray_tracer_tpu.ops.pallas_rows import (
        rows_any_dense, rows_closest_dense, sorted_rows_any,
        sorted_rows_closest)
    from physically_based_ray_tracer_tpu.ops.pallas_trace import (
        intersect_any_dense, sorted_any_dense, sorted_closest_dense)
    from physically_based_ray_tracer_tpu.scene.camera import primary_rays
    from physically_based_ray_tracer_tpu.scene.material import shading_normal
    from physically_based_ray_tracer_tpu.utils import rng
    from physically_based_ray_tracer_tpu.utils.rng import Purpose

    interp = jax.default_backend() not in ("tpu", "axon")
    scene, cam, _ = build_bench_scene()
    dn = scene.dense
    B = 131072
    stride = (1280 * 720) // B
    ids = (jnp.arange(B, dtype=jnp.int64) * stride).astype(jnp.int32)
    xs = (ids % 1280).astype(jnp.float32)
    ys = (ids // 1280).astype(jnp.float32)
    o, d = primary_rays(cam, xs, ys, 1280, 720)
    t_init = jnp.full((B,), 1e30, jnp.float32)

    # bounce rays from primary hits
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
    # shadow rays to light 0
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

    out = {}
    cases = [
        ("primary_closest", closest_body, o, d, t_init,
         sorted_closest_dense, sorted_rows_closest),
        ("bounce_closest", closest_body, bo, bd, bt,
         sorted_closest_dense, sorted_rows_closest),
        ("shadow_any", any_body, so, ld, stm,
         sorted_any_dense, sorted_rows_any),
    ]
    for name, mk, oo, dd, tm, f_shared, f_rows in cases:
        z = jnp.zeros((B,), jnp.float32)
        out[f"{name}_shared_ms"] = round(slope_of(mk(f_shared, oo, dd, tm), z), 3)
        out[f"{name}_rows_ms"] = round(slope_of(mk(f_rows, oo, dd, tm), z), 3)
        print(name, out[f"{name}_shared_ms"], "->", out[f"{name}_rows_ms"],
              flush=True)

    # --- raw MT roll micro: per-roll cycle cost ----------------------------
    def mt_kernel(ox_ref, blk_ref, out_ref, *, rolls):
        ox = ox_ref[:]
        comps0 = [blk_ref[i:i + 1, :] for i in range(9)]
        acc0 = jnp.zeros_like(ox)

        def lbody(k, carry):
            comps, acc = carry
            (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z) = comps
            dx = ox * 0.5
            dy = ox * 0.25
            dz = ox * 0.125
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv = 1.0 / jnp.where(jnp.abs(det) > 1e-9, det, 1.0)
            tx = ox - v0x
            ty = ox - v0y
            tz = ox - v0z
            uu = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            vv = (dx * qx + dy * qy + dz * qz) * inv
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv
            ok = (uu >= 0) & (vv >= 0) & (uu + vv <= 1.0) & (tt > 0)
            acc = jnp.where(ok, jnp.minimum(acc, tt), acc)
            return ([pltpu.roll(c, 1, 1) for c in comps], acc)

        _, acc = jax.lax.fori_loop(0, rolls, lbody, (comps0, acc0))
        out_ref[:] = acc

    X = jnp.ones((8, 128), jnp.float32)
    BLK = jnp.ones((9, 128), jnp.float32)
    for rolls in (128, 1024):
        f = jax.jit(pl.pallas_call(
            functools.partial(mt_kernel, rolls=rolls),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interp))
        ms = wall(f, X, BLK, iters=5)
        out[f"mt_micro_{rolls}rolls_ms"] = round(ms, 4)
        print(f"mt micro {rolls} rolls: {ms:.4f} ms", flush=True)

    docs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs")
    with open(os.path.join(docs, "ROWS_VS_SHARED_r03.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
