"""Probe 3: step-cost timing with large iteration contrast + SMEM capacity."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo/experiments")
from devtime import fetch_scalar
T0 = time.perf_counter()
def log(m): print(f"[{time.perf_counter()-T0:6.1f}s] {m}", flush=True)

def k_steps(tab_ref, ox_ref, out_ref, n_steps, smem=False):
    ox = ox_ref[:]
    def body(c):
        i, cur, acc = c
        if smem:
            r = [tab_ref[cur * 16 + k] for k in range(14)]
        else:
            r = [tab_ref[cur, k] for k in range(14)]
        t0 = (r[0] - ox) * r[1]; t1 = (r[2] - ox) * r[3]
        tn0 = jnp.minimum(t0, t1) * r[4] + r[5]; tf0 = jnp.maximum(t0, t1) * r[6]
        t2 = (r[7] - ox) * r[8]; t3 = (r[9] - ox) * r[10]
        tn1 = jnp.minimum(t2, t3) * r[11]; tf1 = jnp.maximum(t2, t3)
        h0 = jnp.any(tn0 < tf0); h1 = jnp.any(tn1 < tf1)
        m0 = jnp.min(jnp.where(tn0 < tf0, tn0, 1e30))
        m1 = jnp.min(jnp.where(tn1 < tf1, tn1, 1e30))
        nxt = jnp.where(h0 & (m0 < m1), r[12], r[13]).astype(jnp.int32)
        nxt = jnp.where(h1, nxt, r[12].astype(jnp.int32))
        return i + 1, (nxt + i) % 1000, acc + tn0 - tn1
    def cond(c): return c[0] < n_steps
    _, _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0),
                                                jnp.zeros((8, 128), jnp.float32)))
    out_ref[:] = acc

def time_variant(name, tab, space, smem, steps_hi=400000):
    ox = jnp.asarray(np.random.rand(8, 128), jnp.float32)
    def make(n_steps):
        kern = pl.pallas_call(
            lambda a, b, o: k_steps(a, b, o, n_steps, smem),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=space),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        return jax.jit(lambda: kern(tab, ox)[0, 0])
    f1, f2 = make(2000), make(steps_hi)
    fetch_scalar(f1()); fetch_scalar(f2())
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); fetch_scalar(f1()); t1 = time.perf_counter()
        fetch_scalar(f2()); t2 = time.perf_counter()
        dt = ((t2-t1)-(t1-t0))/(steps_hi-2000)
        best = min(best, dt)
    log(f"{name}: {best*1e9:.1f} ns/step ({best*1.704e9:.0f} cyc) "
        f"-> {1024/best/1e6:.0f}M lane-steps/s")

def main():
    N = 4096
    tab = jnp.asarray(np.random.rand(N, 16)*3, jnp.float32)
    time_variant("VMEM (N,16) rows", tab, pltpu.VMEM, False)
    tab1 = jnp.asarray(np.random.rand(N*16)*3, jnp.float32)
    time_variant("SMEM flat (N*16,)", tab1, pltpu.SMEM, True)
    # SMEM capacity probe
    for sz in (1<<16, 1<<18, 1<<20):
        t = jnp.ones((sz,), jnp.float32)
        k = pl.pallas_call(lambda a, o: o.__setitem__(slice(None), jnp.full((8,128), a[0]+a[sz-1], jnp.float32)),
                           out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
                           in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                           out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        try:
            fetch_scalar(k(t)[0,0]); log(f"SMEM {sz*4//1024}KB table: OK")
        except Exception as e:
            log(f"SMEM {sz*4//1024}KB table: FAILED {str(e)[:160]}")

if __name__ == "__main__":
    log(f"device: {jax.devices()[0]}")
    main()
