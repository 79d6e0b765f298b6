"""Probe 2: layout options + step-cost timing for the traversal kernel.

  1. dynamic-LANE scalar read from a transposed (16, N) VMEM table
  2. node table in SMEM (scalar memory) — capacity + reads
  3. timed pseudo-traversal: scalar node fetch + per-lane slab test on
     (8, 128), N steps -> cycles/step estimate
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/experiments")
from devtime import fetch_scalar

T0 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter()-T0:6.1f}s] {m}", flush=True)


def k_lane_scalar(tabT_ref, out_ref):
    # tabT: (16, N); read scalars at dynamic lane index
    def body(i, acc):
        j = (i * 7) % 1000
        v = tabT_ref[3, j] + tabT_ref[4, j + 1]
        return acc + v

    acc = jax.lax.fori_loop(0, 8, body, jnp.float32(0))
    out_ref[:] = jnp.full((8, 128), acc, jnp.float32)


def k_smem_tab(tab_smem_ref, out_ref):
    def body(i, acc):
        j = (i * 13) % 4000
        return acc + tab_smem_ref[j]

    acc = jax.lax.fori_loop(0, 8, body, jnp.float32(0))
    out_ref[:] = jnp.full((8, 128), acc, jnp.float32)


def k_steps(tab_ref, ox_ref, out_ref, n_steps: int):
    """Pseudo traversal: each step reads 14 scalars from (N,16) VMEM table,
    does 2 slab tests on (8,128), reduces, picks next node data-dependently."""
    ox = ox_ref[:]

    def body(c):
        i, cur, acc = c
        r = [tab_ref[cur, k] for k in range(14)]
        t0 = (r[0] - ox) * r[1]
        t1 = (r[2] - ox) * r[3]
        tn0 = jnp.minimum(t0, t1) * r[4] + r[5]
        tf0 = jnp.maximum(t0, t1) * r[6]
        t2 = (r[7] - ox) * r[8]
        t3 = (r[9] - ox) * r[10]
        tn1 = jnp.minimum(t2, t3) * r[11]
        tf1 = jnp.maximum(t2, t3)
        h0 = jnp.any(tn0 < tf0)
        h1 = jnp.any(tn1 < tf1)
        m0 = jnp.min(jnp.where(tn0 < tf0, tn0, 1e30))
        m1 = jnp.min(jnp.where(tn1 < tf1, tn1, 1e30))
        nxt = jnp.where(h0 & (m0 < m1), r[12], r[13]).astype(jnp.int32)
        nxt = jnp.where(h1, nxt, r[12].astype(jnp.int32))
        acc = acc + tn0 - tn1
        return i + 1, (nxt + i) % 1000, acc

    def cond(c):
        return c[0] < n_steps

    _, _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0),
                                                jnp.zeros((8, 128), jnp.float32)))
    out_ref[:] = acc


def main():
    N = 4096
    tabT = jnp.asarray(np.random.rand(16, N), jnp.float32)
    f = pl.pallas_call(
        k_lane_scalar,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        v = fetch_scalar(f(tabT)[0, 0])
        log(f"lane-scalar read OK: {v:.4f}")
    except Exception as e:
        log(f"lane-scalar read FAILED: {str(e)[:300]}")

    tab1 = jnp.asarray(np.random.rand(N), jnp.float32)
    g = pl.pallas_call(
        k_smem_tab,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        v = fetch_scalar(g(tab1)[0, 0])
        log(f"SMEM (4096,) table read OK: {v:.4f}")
    except Exception as e:
        log(f"SMEM table FAILED: {str(e)[:300]}")

    # step-cost timing via slope
    tab = jnp.asarray(np.random.rand(N, 16) * 3, jnp.float32)
    ox = jnp.asarray(np.random.rand(8, 128), jnp.float32)

    def make(n_steps):
        kern = pl.pallas_call(
            lambda a, b, o: k_steps(a, b, o, n_steps),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return jax.jit(lambda: kern(tab, ox)[0, 0])

    f1, f2 = make(2000), make(42000)
    fetch_scalar(f1())
    fetch_scalar(f2())
    t0 = time.perf_counter(); fetch_scalar(f1()); t1 = time.perf_counter()
    fetch_scalar(f2()); t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / 40000
    log(f"pseudo-step: {dt*1e9:.1f} ns/step ({dt*1.7e9:.0f} cycles @1.7GHz) "
        f"-> per 1024-ray tile-step")


if __name__ == "__main__":
    log(f"device: {jax.devices()[0]}")
    main()
