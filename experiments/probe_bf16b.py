"""Workaround probes for the bf16 Mosaic gaps found by probe_bf16.py:
roll, where/select, and bool-chains on packed bf16 vectors."""

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


def try_case(name, kern, *args, outs=None, expect=None):
    outs = outs or (jax.ShapeDtypeStruct((16, 128), jnp.bfloat16),)
    try:
        f = pl.pallas_call(
            kern,
            out_shape=outs if len(outs) > 1 else outs[0],
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=(tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * len(outs))
                       if len(outs) > 1
                       else pl.BlockSpec(memory_space=pltpu.VMEM)),
        )
        r = f(*args)
        v = fetch(r if len(outs) == 1 else r[0])
        status = "OK  "
        if expect is not None and abs(v - expect) > max(1.0, abs(expect)) * 0.02:
            status = "WRONG"
        log(f"{status} {name}: {v:.3f}" +
            (f" (expect {expect:.3f})" if expect is not None else ""))
    except Exception as e:
        log(f"FAIL {name}: {str(e)[:200]}")


def main():
    log(f"device: {jax.devices()[0]}")
    rng = np.random.RandomState(0)
    a_np = rng.rand(16, 128).astype(np.float32)
    b_np = rng.rand(16, 128).astype(np.float32)
    a16 = jnp.asarray(a_np, jnp.bfloat16)
    b16 = jnp.asarray(b_np, jnp.bfloat16)
    roll_expect = float(np.roll(a_np.astype(jnp.bfloat16).astype(np.float32),
                                1, axis=1).sum())

    # 1. roll via bitcast to i32 (packs 2 bf16/lane-slot; lane roll preserved)
    def k1(a, o):
        x = pltpu.bitcast(a[:], jnp.int32)     # (8,128) i32?
        y = pltpu.roll(x, 1, 1)
        o[:] = pltpu.bitcast(y, jnp.bfloat16)
    try_case("roll_bitcast_i32", k1, a16, expect=roll_expect)

    # 2. roll via concat of lane slices
    def k2(a, o):
        x = a[:]
        o[:] = jnp.concatenate([x[:, 127:], x[:, :127]], axis=1)
    try_case("roll_concat", k2, a16, expect=roll_expect)

    # 3. compare -> astype(bf16) arithmetic select
    sel_expect = float(np.where(a_np.astype(jnp.bfloat16).astype(np.float32) > 0.5,
                                a_np.astype(jnp.bfloat16).astype(np.float32),
                                b_np.astype(jnp.bfloat16).astype(np.float32))
                       .astype(jnp.bfloat16).astype(np.float32).sum())

    def k3(a, b, o):
        m = (a[:] > jnp.bfloat16(0.5)).astype(jnp.bfloat16)
        o[:] = m * a[:] + (jnp.bfloat16(1) - m) * b[:]
    try_case("cmp_astype_select", k3, a16, b16, expect=sel_expect)

    # 4. where with f32 mask upcast path
    def k4(a, b, o):
        m = a[:].astype(jnp.float32) > 0.5
        o[:] = jnp.where(m, a[:].astype(jnp.float32),
                         b[:].astype(jnp.float32)).astype(jnp.bfloat16)
    try_case("where_f32_roundtrip", k4, a16, b16, expect=sel_expect)

    # 5. lax.select with bf16
    def k5(a, b, o):
        m = a[:] > jnp.bfloat16(0.5)
        o[:] = jax.lax.select(m, a[:], b[:])
    try_case("lax_select_bf16", k5, a16, b16, expect=sel_expect)

    # 6. bool chain then astype
    def k6(a, b, o):
        m = (a[:] > 0) & (b[:] > 0) & (a[:] + b[:] <= jnp.bfloat16(1.0))
        o[:] = m.astype(jnp.bfloat16)
    try_case("boolchain_astype", k6, a16, b16)

    # 7. arithmetic-only mask: products of step functions via min/max
    def k7(a, b, o):
        # step(x) ~ (sign(x)+1)/2 without compares: use max(min(x*1e4,1),0)
        def step(x):
            return jnp.maximum(jnp.minimum(x * jnp.bfloat16(1e4),
                                           jnp.bfloat16(1)), jnp.bfloat16(0))
        m = step(a[:] - jnp.bfloat16(0.5))
        o[:] = m * a[:] + (jnp.bfloat16(1) - m) * b[:]
    try_case("arith_step_select", k7, a16, b16)

    # 8. min/max accumulate (for best-t without select)
    def k8(a, b, o):
        o[:] = jnp.minimum(a[:], b[:])
    try_case("min_bf16", k8, a16, b16)

    # 9. i32 out via f32 mask (gk tracking): mask in f32 domain
    def k9(a, o1, o2):
        m32 = a[:].astype(jnp.float32) > 0.5
        o1[:] = jnp.where(m32, a[:].astype(jnp.float32), 0.0
                          ).astype(jnp.bfloat16)
        o2[:] = jnp.where(m32, 7, -1).astype(jnp.int32)
    try_case("i32_gk_via_f32mask", k9, a16,
             outs=(jax.ShapeDtypeStruct((16, 128), jnp.bfloat16),
                   jax.ShapeDtypeStruct((16, 128), jnp.int32)))


if __name__ == "__main__":
    main()
