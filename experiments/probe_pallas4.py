"""Probe 4: leaf intersection cost — (K,12) block load + static extracts + MT."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo/experiments")
from devtime import fetch_scalar
T0 = time.perf_counter()
def log(m): print(f"[{time.perf_counter()-T0:6.1f}s] {m}", flush=True)

K = 4

def k_leaf(tris_ref, ox_ref, out_ref, n_steps):
    ox = ox_ref[:]; oy = ox * 1.1; oz = ox * 0.9
    dx = ox * 0.5; dy = ox * 0.3; dz = ox * 0.7
    def body(c):
        i, first, t_best = c
        blk = tris_ref[pl.ds(first, K), :]          # (K, 12) vector load
        for k in range(K):
            v0x, v0y, v0z = blk[k, 0], blk[k, 1], blk[k, 2]
            e1x, e1y, e1z = blk[k, 3], blk[k, 4], blk[k, 5]
            e2x, e2y, e2z = blk[k, 6], blk[k, 7], blk[k, 8]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv = 1.0 / jnp.where(jnp.abs(det) > 1e-9, det, 1.0)
            tx = ox - v0x; ty = oy - v0y; tz = oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv
            t = (e2x * qx + e2y * qy + e2z * qz) * inv
            ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0) & (t < t_best)
            t_best = jnp.where(ok, t, t_best)
        nxt = (first + jnp.min(t_best).astype(jnp.int32) % 7 + 1) % 1000
        return i + 1, nxt, t_best
    def cond(c): return c[0] < n_steps
    _, _, t_best = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0),
                     jnp.full((8, 128), 1e30, jnp.float32)))
    out_ref[:] = t_best

def main():
    P = 8192
    tris = jnp.asarray(np.random.rand(P, 12), jnp.float32)
    ox = jnp.asarray(np.random.rand(8, 128), jnp.float32)
    def make(n):
        kern = pl.pallas_call(
            lambda a, b, o: k_leaf(a, b, o, n),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        return jax.jit(lambda: kern(tris, ox)[0, 0])
    f1, f2 = make(1000), make(101000)
    fetch_scalar(f1()); fetch_scalar(f2())
    best = 1e9
    for _ in range(3):
        t0=time.perf_counter(); fetch_scalar(f1()); t1=time.perf_counter()
        fetch_scalar(f2()); t2=time.perf_counter()
        best = min(best, ((t2-t1)-(t1-t0))/100000)
    log(f"leaf visit (K={K} tris, 1024 rays): {best*1e9:.0f} ns ({best*1.704e9:.0f} cyc) "
        f"-> {best*1.704e9/K:.0f} cyc/tri-test")

if __name__ == "__main__":
    log(f"device: {jax.devices()[0]}")
    main()
