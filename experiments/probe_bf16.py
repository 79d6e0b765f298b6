"""Isolate which bf16 construct the Mosaic TPU compiler rejects.

experiments/bf16_sweep.py's bf16 kernels all failed remote compile with an
opaque HTTP 500; this probes minimal kernels one at a time.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T0 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter()-T0:6.1f}s] {m}", flush=True)


def fetch(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def try_case(name, kern, *args, n_out=1,
             out=((16, 128), jnp.bfloat16)):
    try:
        outs = tuple(jax.ShapeDtypeStruct(*out) for _ in range(n_out))
        if n_out == 1:
            outs = outs[0]
        f = pl.pallas_call(
            kern,
            out_shape=outs,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM) if n_out == 1
                       else tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out)),
        )
        r = f(*args)
        v = fetch(r if n_out == 1 else r[0])
        log(f"OK   {name}: {v:.3f}")
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:300]
        log(f"FAIL {name}: {msg}")
        return False


def main():
    log(f"device: {jax.devices()[0]}")
    rng = np.random.RandomState(0)
    a16 = jnp.asarray(rng.rand(16, 128), jnp.bfloat16)
    b16 = jnp.asarray(rng.rand(16, 128), jnp.bfloat16)
    a32r = jnp.asarray(rng.rand(32, 128), jnp.bfloat16)

    # 1. plain elementwise bf16
    try_case("mul_bf16", lambda a, b, o: o.__setitem__(
        slice(None), a[:] * b[:]), a16, b16)

    # 2. pltpu.roll on bf16 (16,128)
    try_case("roll_bf16_16x128", lambda a, o: o.__setitem__(
        slice(None), pltpu.roll(a[:], 1, 1)), a16)

    # 3. pltpu.roll on bf16 (32,128)
    try_case("roll_bf16_32x128", lambda a, o: o.__setitem__(
        slice(None), pltpu.roll(a[:], 1, 1)[:16]), a32r)

    # 4. row slice (1,128) broadcast mul
    try_case("rowslice_bcast", lambda a, b, o: o.__setitem__(
        slice(None), a[0:1, :] * b[:]), a16, b16)

    # 5. where on bf16
    try_case("where_bf16", lambda a, b, o: o.__setitem__(
        slice(None), jnp.where(a[:] > 0.5, a[:], b[:])), a16, b16)

    # 6. reciprocal / division bf16
    try_case("div_bf16", lambda a, b, o: o.__setitem__(
        slice(None), a[:] / (b[:] + jnp.bfloat16(1.0))), a16, b16)

    # 7. fori_loop carrying bf16 with roll
    def k7(a, o):
        def body(i, x):
            return pltpu.roll(x, 1, 1)
        o[:] = jax.lax.fori_loop(0, 8, body, a[:])
    try_case("fori_roll_bf16", k7, a16)

    # 8. broadcast_to + concatenate assembly
    def k8(a, o):
        x = jnp.broadcast_to(a[0:1, :], (8, 128))
        y = jnp.broadcast_to(a[1:2, :], (8, 128))
        o[:] = jnp.concatenate([x, y], axis=0)
    try_case("bcast_concat_bf16", k8, a16)

    # 9. pltpu.repeat (2,128)->(16,128)
    def k9(a, o):
        o[:] = pltpu.repeat(a[0:2, :], 8, 0)
    try_case("repeat_bf16", k9, a16)

    # 10. int32 (16,128) where write alongside bf16
    def k10(a, o1, o2):
        ok = a[:] > 0.5
        o1[:] = jnp.where(ok, a[:], jnp.bfloat16(0))
        o2[:] = jnp.where(ok, 1, -1).astype(jnp.int32)
    try:
        f = pl.pallas_call(
            k10,
            out_shape=(jax.ShapeDtypeStruct((16, 128), jnp.bfloat16),
                       jax.ShapeDtypeStruct((16, 128), jnp.int32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
        )
        r = f(a16)
        fetch(r[0])
        log("OK   bf16+i32 outs")
    except Exception as e:
        log(f"FAIL bf16+i32 outs: {str(e)[:300]}")

    # 11. comparisons chain & boolean ops bf16
    def k11(a, b, o):
        ok = (a[:] >= 0.0) & (b[:] >= 0.0) & (a[:] + b[:] <= 1.0)
        o[:] = jnp.where(ok, a[:], b[:])
    try_case("cmp_chain_bf16", k11, a16, b16)

    # 12. the full MT body once (no loop)
    def k12(a, r, o):
        comps = [a[i:i + 1, :] for i in range(9)]
        rays = [r[16 * k:16 * k + 16, :] for k in range(6)]
        ox, oy, oz, dx, dy, dz = rays
        v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = comps
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        one = jnp.bfloat16(1.0)
        big = jnp.abs(det) > one * 1e-9
        inv = one / jnp.where(big, det, one)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        uu = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        vv = (dx * qx + dy * qy + dz * qz) * inv
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv
        ok = big & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) & (tt > 0.0)
        o[:] = jnp.where(ok, tt, jnp.bfloat16(0))
    rays96 = jnp.asarray(rng.rand(96, 128), jnp.bfloat16)
    try_case("mt_body_bf16", k12, a16, rays96)


if __name__ == "__main__":
    main()
