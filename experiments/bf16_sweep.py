"""bf16 leaf-sweep micro-benchmark (round-4 perf lever #1).

The shared-stack megakernel is vector-throughput-bound on its leaf roll
sweep: ~40 (8,128) f32 VPU ops per iteration testing 1024 ray-triangle
pairs (docs/PERF_LOG.md speed-of-light analysis). bf16's native tile is
(16,128) — one vreg holds 2048 bf16 lanes — so a bf16 Moller-Trumbore
sweep tests 2x the pairs per op.

Mosaic constraints measured by experiments/probe_bf16{,b}.py on this
chip: bf16 COMPARISONS and selects are unsupported (packed i1 masks);
bf16 arithmetic, min/max, broadcast/concat/repeat assembly, and lane
rolls via an i32 bitcast all work, and masks can round-trip through f32.
The candidate kernels below are built ONLY from the working constructs:

  A  f32 baseline: the production sweep (16,128)-block roll, full accept
     machinery (t/u/v/prim/inst updates) — control.
  E  f32 + gk-accept: drop u/v/prim updates + the opr row; record the
     (leafcode, roll k) winner instead; prim is reconstructed after the
     kernel (lane l at roll k tested group lane (l-k) mod 128) and the
     exact hit refined in f32 — fewer update ops at identical test width.
  B  bf16 2048-ray tile: 2x tests/op, but the tile divergence union
     grows (measured separately: experiments/union_growth.py).
  C  bf16 1024 rays x 2 triangles: ray comps duplicated into both
     sublane halves once per tile; each block stores set A and set B
     (= A pre-rolled by c/2, baked at build time); comps assembled by
     broadcast+concat. Union unchanged by construction.
  D  like C but assembly via pltpu.repeat on interleaved (2,128) pairs.
  OA/OC  occlusion (any-hit) variants of A and C: accept folds into a
     pure bf16 max-accumulate — no f32 mask ops at all.

Accept logic without bf16 compares: all conditions are y_i > 0 with
y = (|det|-eps, u, v, 1-u-v, t); m = step(min_i y_i) where
step(x) = clamp(x*1e4, 0, 1) (exact outside a ~1e-4 boundary band);
t_cand = t + (1-m)*BIG; best-t = min-accumulate. The (g,k) winner id is
selected with ONE f32-domain mask (t_cand upcast + compare + 2 selects).

Slope-method timing (per-dispatch relay overhead ~25-35 ms): cost =
median over 3 reps of (t(N2) - t(N1)) / (N2 - N1), N2-N1 = 2M iters.

Run (one TPU job at a time!):  python experiments/bf16_sweep.py
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T0 = time.perf_counter()


def _one():
    # fresh numpy scalar each trace: a module-level jnp scalar would be
    # captured as a pallas closure constant (disallowed)
    return np.asarray(1.0, jnp.bfloat16)


def _k():
    return np.asarray(1e4, jnp.bfloat16)


def log(m):
    print(f"[{time.perf_counter()-T0:6.1f}s] {m}", flush=True)


def fetch(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def roll_bf16(x, interpret):
    if interpret:
        return jnp.roll(x, 1, axis=1)
    return pltpu.bitcast(pltpu.roll(pltpu.bitcast(x, jnp.int32), 1, 1),
                         jnp.bfloat16)


def roll_f32(x, interpret):
    return jnp.roll(x, 1, axis=1) if interpret else pltpu.roll(x, 1, 1)


def step(x):
    """~(x > 0) as bf16 0/1; exact outside |x| < 1e-4."""
    return jnp.maximum(jnp.minimum(x * _k(), _one()),
                       np.asarray(0, jnp.bfloat16))


def _mt(ox, oy, oz, dx, dy, dz, comps, one):
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = comps
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    adet = jnp.abs(det)
    if one.dtype == jnp.float32:
        big = adet > 1e-9
        inv = one / jnp.where(big, det, one)
    else:
        big = None
        inv = one / (det + np.asarray(1e-30, jnp.bfloat16))   # guarded by the mask below
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    uu = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    vv = (dx * qx + dy * qy + dz * qz) * inv
    tt = (e2x * qx + e2y * qy + e2z * qz) * inv
    return uu, vv, tt, adet, big


def accept_mask_bf16(uu, vv, tt, adet):
    """m = step(min of the accept margins) — pure bf16 arithmetic."""
    y = jnp.minimum(jnp.minimum(uu, vv),
                    jnp.minimum(_one() - uu - vv, tt))
    y = jnp.minimum(y, adet - np.asarray(1e-8, jnp.bfloat16))
    return step(y)


# --- f32 production-shaped baseline -----------------------------------------
def kern_A(blk_ref, rays_ref, t_ref, u_ref, v_ref, p_ref, i_ref, *, n_iters,
           interpret):
    ox, oy, oz, dx, dy, dz = [rays_ref[8 * k:8 * k + 8, :] for k in range(6)]
    t_ref[:] = jnp.full((8, 128), 1e30, jnp.float32)
    u_ref[:] = jnp.zeros((8, 128), jnp.float32)
    v_ref[:] = jnp.zeros((8, 128), jnp.float32)
    p_ref[:] = jnp.full((8, 128), -1, jnp.int32)
    i_ref[:] = jnp.full((8, 128), -1, jnp.int32)

    def body(k, blk):
        comps = [blk[i:i + 1, :] for i in range(10)]
        uu, vv, tt, _, big = _mt(ox, oy, oz, dx, dy, dz, comps[:9],
                                 jnp.float32(1.0))
        ok = (big & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
              & (tt > 0.0))
        t_cur = t_ref[:]
        ok = ok & (tt < t_cur)
        t_ref[:] = jnp.where(ok, tt, t_cur)
        u_ref[:] = jnp.where(ok, uu, u_ref[:])
        v_ref[:] = jnp.where(ok, vv, v_ref[:])
        p_ref[:] = jnp.where(ok, comps[9].astype(jnp.int32), p_ref[:])
        i_ref[:] = jnp.where(ok, k, i_ref[:])
        return roll_f32(blk, interpret)

    jax.lax.fori_loop(0, n_iters, body, blk_ref[:])


def kern_E(blk_ref, rays_ref, t_ref, gk_ref, *, n_iters, interpret):
    ox, oy, oz, dx, dy, dz = [rays_ref[8 * k:8 * k + 8, :] for k in range(6)]
    t_ref[:] = jnp.full((8, 128), 1e30, jnp.float32)
    gk_ref[:] = jnp.full((8, 128), -1, jnp.int32)

    def body(k, blk):
        comps = [blk[i:i + 1, :] for i in range(9)]
        uu, vv, tt, _, big = _mt(ox, oy, oz, dx, dy, dz, comps,
                                 jnp.float32(1.0))
        ok = (big & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
              & (tt > 0.0))
        t_cur = t_ref[:]
        ok = ok & (tt < t_cur)
        t_ref[:] = jnp.where(ok, tt, t_cur)
        gk_ref[:] = jnp.where(ok, k, gk_ref[:])
        return roll_f32(blk, interpret)

    jax.lax.fori_loop(0, n_iters, body, blk_ref[:])


# --- bf16 closest variants ---------------------------------------------------
def _bf16_closest_body(comps, rays, t_ref, gk_ref, k):
    ox, oy, oz, dx, dy, dz = rays
    uu, vv, tt, adet, _ = _mt(ox, oy, oz, dx, dy, dz, comps, _one())
    m = accept_mask_bf16(uu, vv, tt, adet)
    t_cand = tt + (_one() - m) * np.asarray(1e30, jnp.bfloat16)
    t_new = jnp.minimum(t_ref[:], t_cand)
    # winner id via ONE f32-domain mask (bf16 compares unsupported)
    won = t_cand.astype(jnp.float32) <= t_new.astype(jnp.float32)
    t_ref[:] = t_new
    gk_ref[:] = jnp.where(won, k, gk_ref[:])


def kern_B(blk_ref, rays_ref, t_ref, gk_ref, *, n_iters, interpret):
    rays = [rays_ref[16 * k:16 * k + 16, :] for k in range(6)]
    t_ref[:] = jnp.full((16, 128), 1e30, jnp.bfloat16)
    gk_ref[:] = jnp.full((16, 128), -1, jnp.int32)

    def body(k, blk):
        comps = [blk[i:i + 1, :] for i in range(9)]
        _bf16_closest_body(comps, rays, t_ref, gk_ref, k)
        return roll_bf16(blk, interpret)

    jax.lax.fori_loop(0, n_iters, body, blk_ref[:])


def kern_C(blk_ref, rays_ref, t_ref, gk_ref, *, n_iters, interpret):
    # blk (32,128): comp i = rows i (set A) and 16+i (set B)
    rays = [rays_ref[16 * k:16 * k + 16, :] for k in range(6)]
    t_ref[:] = jnp.full((16, 128), 1e30, jnp.bfloat16)
    gk_ref[:] = jnp.full((16, 128), -1, jnp.int32)

    def body(k, blk):
        comps = []
        for i in range(9):
            a = jnp.broadcast_to(blk[i:i + 1, :], (8, 128))
            b = jnp.broadcast_to(blk[16 + i:16 + i + 1, :], (8, 128))
            comps.append(jnp.concatenate([a, b], axis=0))
        _bf16_closest_body(comps, rays, t_ref, gk_ref, k)
        return roll_bf16(blk, interpret)

    jax.lax.fori_loop(0, n_iters, body, blk_ref[:])


def kern_D(blk_ref, rays_ref, t_ref, gk_ref, *, n_iters, interpret):
    # blk (32,128): comp i at rows 2i (A), 2i+1 (B); repeat assembly
    rays = [rays_ref[16 * k:16 * k + 16, :] for k in range(6)]
    t_ref[:] = jnp.full((16, 128), 1e30, jnp.bfloat16)
    gk_ref[:] = jnp.full((16, 128), -1, jnp.int32)

    def body(k, blk):
        comps = []
        for i in range(9):
            pair = blk[2 * i:2 * i + 2, :]
            comps.append(jnp.repeat(pair, 8, axis=0) if interpret
                         else pltpu.repeat(pair, 8, 0))
        _bf16_closest_body(comps, rays, t_ref, gk_ref, k)
        return roll_bf16(blk, interpret)

    jax.lax.fori_loop(0, n_iters, body, blk_ref[:])


# --- multi-band packings: R rays x p triangles, R*p = 2048 ------------------
# band layout: block stores each component as p rows (band b = set A
# pre-rolled by b*c/p, baked at build time); comp16 = repeat(p rows, 16/p)
# pairs band b with every ray row; rays_ref holds the R-ray tile already
# tiled p times into (16,128).
def make_kern_Cp(p_bands):
    rows = 16 // p_bands     # ray rows per band

    def kern(blk_ref, rays_ref, t_ref, gk_ref, *, n_iters, interpret):
        rays = [rays_ref[16 * k:16 * k + 16, :] for k in range(6)]
        t_ref[:] = jnp.full((16, 128), 1e30, jnp.bfloat16)
        gk_ref[:] = jnp.full((16, 128), -1, jnp.int32)

        def body(k, blk):
            comps = []
            for i in range(9):
                band = blk[p_bands * i:p_bands * i + p_bands, :]
                comps.append(jnp.repeat(band, rows, axis=0) if interpret
                             else pltpu.repeat(band, rows, 0))
            _bf16_closest_body(comps, rays, t_ref, gk_ref, k)
            return roll_bf16(blk, interpret)

        jax.lax.fori_loop(0, n_iters, body, blk_ref[:])

    return kern


def kern_C16(blk_ref, rays_ref, t_ref, gk_ref, *, n_iters, interpret):
    # p=16: each comp IS a prebaked (16,128) block — zero assembly
    rays = [rays_ref[16 * k:16 * k + 16, :] for k in range(6)]
    t_ref[:] = jnp.full((16, 128), 1e30, jnp.bfloat16)
    gk_ref[:] = jnp.full((16, 128), -1, jnp.int32)

    def body(k, blk):
        comps = [blk[16 * i:16 * i + 16, :] for i in range(9)]
        _bf16_closest_body(comps, rays, t_ref, gk_ref, k)
        return roll_bf16(blk, interpret)

    jax.lax.fori_loop(0, n_iters, body, blk_ref[:])


def kern_O4(blk_ref, rays_ref, occ_ref, *, n_iters, interpret):
    # occlusion, p=4 bands via repeat
    rays = [rays_ref[16 * k:16 * k + 16, :] for k in range(6)]
    occ_ref[:] = jnp.zeros((16, 128), jnp.bfloat16)
    tmax = jnp.full((16, 128), 0.7, jnp.bfloat16)

    def body(k, blk):
        comps = []
        for i in range(9):
            band = blk[4 * i:4 * i + 4, :]
            comps.append(jnp.repeat(band, 4, axis=0) if interpret
                         else pltpu.repeat(band, 4, 0))
        ox, oy, oz, dx, dy, dz = rays
        uu, vv, tt, adet, _ = _mt(ox, oy, oz, dx, dy, dz, comps, _one())
        y = jnp.minimum(jnp.minimum(uu, vv),
                        jnp.minimum(_one() - uu - vv, tt))
        y = jnp.minimum(y, jnp.minimum(adet - np.asarray(1e-8, jnp.bfloat16),
                                       tmax - tt))
        occ_ref[:] = jnp.maximum(occ_ref[:], step(y))
        return roll_bf16(blk, interpret)

    jax.lax.fori_loop(0, n_iters, body, blk_ref[:])


# --- occlusion (any-hit) -----------------------------------------------------
def kern_OA(blk_ref, rays_ref, occ_ref, *, n_iters, interpret):
    ox, oy, oz, dx, dy, dz = [rays_ref[8 * k:8 * k + 8, :] for k in range(6)]
    occ_ref[:] = jnp.zeros((8, 128), jnp.float32)
    tmax = jnp.full((8, 128), 0.7, jnp.float32)

    def body(k, blk):
        comps = [blk[i:i + 1, :] for i in range(9)]
        uu, vv, tt, _, big = _mt(ox, oy, oz, dx, dy, dz, comps,
                                 jnp.float32(1.0))
        ok = (big & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
              & (tt > 0.0) & (tt < tmax))
        occ_ref[:] = jnp.where(ok, 1.0, occ_ref[:])
        return roll_f32(blk, interpret)

    jax.lax.fori_loop(0, n_iters, body, blk_ref[:])


def kern_OC(blk_ref, rays_ref, occ_ref, *, n_iters, interpret):
    # pure-bf16 any-hit: occ = max-accumulate of the accept mask
    rays = [rays_ref[16 * k:16 * k + 16, :] for k in range(6)]
    occ_ref[:] = jnp.zeros((16, 128), jnp.bfloat16)
    tmax = jnp.full((16, 128), 0.7, jnp.bfloat16)

    def body(k, blk):
        comps = []
        for i in range(9):
            a = jnp.broadcast_to(blk[i:i + 1, :], (8, 128))
            b = jnp.broadcast_to(blk[16 + i:16 + i + 1, :], (8, 128))
            comps.append(jnp.concatenate([a, b], axis=0))
        ox, oy, oz, dx, dy, dz = rays
        uu, vv, tt, adet, _ = _mt(ox, oy, oz, dx, dy, dz, comps, _one())
        y = jnp.minimum(jnp.minimum(uu, vv),
                        jnp.minimum(_one() - uu - vv, tt))
        y = jnp.minimum(y, jnp.minimum(adet - np.asarray(1e-8, jnp.bfloat16),
                                       tmax - tt))
        occ_ref[:] = jnp.maximum(occ_ref[:], step(y))
        return roll_bf16(blk, interpret)

    jax.lax.fori_loop(0, n_iters, body, blk_ref[:])


def build(kern, spec, n_iters, interpret=False):
    outs = {
        "A": [((8, 128), jnp.float32)] * 3 + [((8, 128), jnp.int32)] * 2,
        "E": [((8, 128), jnp.float32), ((8, 128), jnp.int32)],
        "B": [((16, 128), jnp.bfloat16), ((16, 128), jnp.int32)],
        "OA": [((8, 128), jnp.float32)],
        "OC": [((16, 128), jnp.bfloat16)],
    }[spec]
    out_shape = tuple(jax.ShapeDtypeStruct(s, d) for s, d in outs)
    out_specs = tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * len(outs))
    if len(outs) == 1:
        out_shape, out_specs = out_shape[0], out_specs[0]
    return pl.pallas_call(
        functools.partial(kern, n_iters=n_iters, interpret=interpret),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=out_specs,
        interpret=interpret,
    )


def main():
    interpret = jax.devices()[0].platform != "tpu"
    log(f"device: {jax.devices()[0]} interpret={interpret}")
    rng = np.random.RandomState(0)
    blk_f32 = jnp.asarray(rng.rand(16, 128), jnp.float32)
    blk_bf = jnp.asarray(rng.rand(16, 128), jnp.bfloat16)
    blk_bf32 = jnp.asarray(rng.rand(32, 128), jnp.bfloat16)
    rays48 = jnp.asarray(rng.rand(48, 128), jnp.float32)
    rays96 = jnp.asarray(rng.rand(96, 128), jnp.bfloat16)
    blk_bf36 = jnp.asarray(rng.rand(36, 128), jnp.bfloat16)
    blk_bf72 = jnp.asarray(rng.rand(72, 128), jnp.bfloat16)
    blk_bf144 = jnp.asarray(rng.rand(144, 128), jnp.bfloat16)

    N1, N2 = (100_000, 2_100_000) if not interpret else (2, 6)
    cases = {
        "A_f32_full": (kern_A, blk_f32, rays48, "A", 1024),
        "E_f32_gk": (kern_E, blk_f32, rays48, "E", 1024),
        "B_bf16_2048rays": (kern_B, blk_bf, rays96, "B", 2048),
        "C_bf16_2tri_concat": (kern_C, blk_bf32, rays96, "B", 2048),
        "D_bf16_2tri_repeat": (kern_D, blk_bf32, rays96, "B", 2048),
        "C4_bf16_4tri_repeat": (make_kern_Cp(4), blk_bf36, rays96, "B", 2048),
        "C8_bf16_8tri_repeat": (make_kern_Cp(8), blk_bf72, rays96, "B", 2048),
        "C16_bf16_16tri_direct": (kern_C16, blk_bf144, rays96, "B", 2048),
        "OA_f32_occl": (kern_OA, blk_f32, rays48, "OA", 1024),
        "OC_bf16_occl_2tri": (kern_OC, blk_bf32, rays96, "OC", 2048),
        "O4_bf16_occl_4tri": (kern_O4, blk_bf36, rays96, "OC", 2048),
    }
    results = {}
    for name, (kern, blk, rays, spec, tests) in cases.items():
        try:
            f1 = build(kern, spec, N1, interpret)
            f2 = build(kern, spec, N2, interpret)
            g1 = jax.jit(lambda b=blk, r=rays, f=f1: (f(b, r)[0]
                                                      if spec != "OC" and spec != "OA"
                                                      else f(b, r)))
            g2 = jax.jit(lambda b=blk, r=rays, f=f2: (f(b, r)[0]
                                                      if spec != "OC" and spec != "OA"
                                                      else f(b, r)))
            fetch(g1())
            fetch(g2())
            slopes = []
            for _ in range(3):
                t0 = time.perf_counter()
                fetch(g1())
                t1 = time.perf_counter()
                fetch(g2())
                t2 = time.perf_counter()
                slopes.append(((t2 - t1) - (t1 - t0)) / (N2 - N1))
            slopes.sort()
            per_iter = slopes[1]
            results[name] = {
                "ns_per_iter": round(per_iter * 1e9, 2),
                "tests_per_iter": tests,
                "ns_per_1024_tests": round(per_iter * 1e9 * 1024 / tests, 2),
            }
            log(f"{name}: {results[name]}")
        except Exception as e:
            results[name] = {"error": str(e)[:300]}
            log(f"{name} FAILED: {str(e)[:300]}")

    base = results.get("A_f32_full", {}).get("ns_per_1024_tests")
    if base:
        for n, r in results.items():
            if "ns_per_1024_tests" in r:
                r["speedup_vs_A"] = round(base / r["ns_per_1024_tests"], 2)
    with open("/root/repo/docs/BF16_SWEEP_r04.json", "w") as f:
        json.dump({"method": "median of 3 slopes over fori_loop iters "
                             "(N2-N1=2e6), one program",
                   "results": results}, f, indent=1)
    log("wrote docs/BF16_SWEEP_r04.json")
    for n, r in results.items():
        log(f"  {n}: {r}")


if __name__ == "__main__":
    main()
