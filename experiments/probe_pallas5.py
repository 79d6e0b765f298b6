"""Probe 5: dense-leaf primitives — (G,12,128) group load at dynamic g,
(8,1)x(1,128) broadcast MT, lane-reduce best-hit, timing."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo/experiments")
from devtime import fetch_scalar
T0 = time.perf_counter()
def log(m): print(f"[{time.perf_counter()-T0:6.1f}s] {m}", flush=True)

def k_dense(groups_ref, rays_ref, out_ref, n_steps):
    rays = rays_ref[:]                      # (8,128) "ox"
    def body(c):
        i, g, acc = c
        blk = groups_ref[g]                 # (12,128) dynamic first-dim index
        v0x = blk[0:1, :]                   # (1,128) tri comp
        e1x = blk[3:4, :]
        e2x = blk[6:7, :]
        t_min = acc
        for col in range(0, 128, 16):       # subset of ray columns for probe
            r8 = rays[:, col:col+1]         # (8,1) rays
            px = r8 * e2x - v0x             # (8,128) = 8 rays x 128 tris
            det = e1x * px + r8
            t = px / jnp.where(jnp.abs(det) > 1e-9, det, 1.0)
            ok = (t > 0) & (t < 1e30)
            tc = jnp.where(ok, t, 1e30)
            best = jnp.min(tc, axis=1, keepdims=True)     # (8,1) per-ray best
            orig = blk[9:10, :]
            ob = jnp.min(jnp.where(tc <= best, orig, 1e30), axis=1, keepdims=True)
            t_min = t_min.at[:, col:col+1].set(best + ob * 0.0)
        nxt = (g + 1 + jnp.min(t_min).astype(jnp.int32) % 3) % groups_ref.shape[0]
        return i + 1, nxt, t_min
    def cond(c): return c[0] < n_steps
    _, _, acc = jax.lax.while_loop(cond, body,
        (jnp.int32(0), jnp.int32(0), jnp.full((8, 128), 1e30, jnp.float32)))
    out_ref[:] = acc

def main():
    G = 64
    groups = jnp.asarray(np.random.rand(G, 12, 128), jnp.float32)
    rays = jnp.asarray(np.random.rand(8, 128), jnp.float32)
    def make(n):
        kern = pl.pallas_call(
            lambda a, b, o: k_dense(a, b, o, n),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        return jax.jit(lambda: kern(groups, rays)[0, 0])
    f1, f2 = make(500), make(20500)
    v = fetch_scalar(f1()); log(f"dense-leaf kernel compiles+runs: {v:.3f}")
    fetch_scalar(f2())
    best = 1e9
    for _ in range(3):
        t0=time.perf_counter(); fetch_scalar(f1()); t1=time.perf_counter()
        fetch_scalar(f2()); t2=time.perf_counter()
        best = min(best, ((t2-t1)-(t1-t0))/20000)
    # probe did 8 of 128 columns with ~12 ops each -> scale estimate
    log(f"probe step (8/128 cols, ~12op MT-lite): {best*1e9:.0f} ns "
        f"({best*1.704e9:.0f} cyc)")

if __name__ == "__main__":
    log(f"device: {jax.devices()[0]}")
    main()
