"""Feasibility probe for the Pallas traversal kernel primitives:

  * scalar read from a VMEM ref at a dynamic (traced) index
  * while_loop with mixed scalar + (8,128) vector carry
  * SMEM scratch stack with dynamic-index store/load
  * full-block any()/min() reduce to scalar
  * sublane dynamic slice from a (N, W) VMEM table

Run: python experiments/probe_pallas.py [cpu]
"""
import sys
import time

if "cpu" in sys.argv:
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T0 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter()-T0:6.1f}s] {m}", flush=True)


def kernel(table_ref, x_ref, out_ref, stack_ref):
    # walk: idx chain via scalar reads; push/pop SMEM stack; vector accum
    def cond(c):
        cur, sp, acc = c
        return cur >= 0

    def body(c):
        cur, sp, acc = c
        v0 = table_ref[cur, 0]                    # scalar read, dynamic row
        v1 = table_ref[cur, 1]
        nxt = table_ref[cur, 2].astype(jnp.int32)  # f32 -> i32 scalar cast
        acc = acc + v0 * x_ref[:] + v1
        hit = jnp.any(acc > 0.5)                  # block reduce -> scalar
        tmin = jnp.min(acc)

        # push cur+1 when hit, using SMEM dynamic store
        @pl.when(hit & (sp < 16))
        def _():
            stack_ref[sp] = nxt + 1

        sp2 = jnp.where(hit & (sp < 16), sp + 1, sp)
        # pop when nxt < 0 and sp2 > 0
        do_pop = (nxt < 0) & (sp2 > 0)
        top = stack_ref[jnp.maximum(sp2 - 1, 0)]
        cur2 = jnp.where(do_pop, top - 1000000, nxt)  # make popped path terminate
        sp3 = jnp.where(do_pop, sp2 - 1, sp2)
        return cur2, sp3, acc + tmin * 0.0

    cur0 = jnp.int32(0)
    sp0 = jnp.int32(0)
    acc0 = jnp.zeros_like(x_ref)
    _, _, acc = jax.lax.while_loop(cond, body, (cur0, sp0, acc0))
    out_ref[:] = acc


def kernel_subslice(table_ref, x_ref, out_ref):
    # dynamic sublane slice: fetch 4 contiguous rows at traced offset
    idx = (x_ref[0, 0] * 0).astype(jnp.int32) + 3
    rows = table_ref[pl.ds(idx, 4), :]            # (4, W)
    out_ref[:] = x_ref[:] + jnp.sum(rows)


def main():
    interp = "cpu" in sys.argv
    N, W = 64, 8
    tab = np.zeros((N, W), np.float32)
    # chain: node i -> i+1 until 9, then leaf (-1)
    tab[:, 0] = 0.001
    tab[:, 1] = 0.002
    tab[:, 2] = np.arange(N) + 1.0
    tab[9, 2] = -1.0
    table = jnp.asarray(tab)
    x = jnp.ones((8, 128), jnp.float32) * 0.01

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((16,), jnp.int32)],
        interpret=interp,
    )
    out = f(table, x)
    v = float(np.asarray(out[0, 0]))
    log(f"walk kernel ok: out[0,0]={v:.5f}")

    g = pl.pallas_call(
        kernel_subslice,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interp,
    )
    out = g(table, x)
    v = float(np.asarray(out[0, 0]))
    log(f"subslice kernel ok: out[0,0]={v:.5f}")


if __name__ == "__main__":
    log(f"device: {jax.devices()[0]}")
    main()
