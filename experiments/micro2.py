"""On-chip microbenchmarks with slope timing (see devtime.py).

python experiments/micro2.py  — writes incremental results to stdout.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from devtime import fetch_scalar, loopify, time_iterated

T0 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter()-T0:7.1f}s] {m}", flush=True)


def bench_fetch():
    f = jax.jit(lambda: jnp.float32(1.0) + 1.0)
    fetch_scalar(f())
    for i in range(3):
        t0 = time.perf_counter()
        fetch_scalar(f())
        log(f"scalar fetch {i}: {time.perf_counter()-t0:.3f}s")


def bench_matmul(k=4096):
    a = jax.random.normal(jax.random.key(0), (k, k), jnp.bfloat16)

    def step(c, i):
        return jnp.tanh(c @ a)

    def init():
        return a

    dt = time_iterated(lambda L: loopify(step, init, L), 2, 12)
    log(f"bf16 {k}x{k} matmul chain: {dt*1e3:.3f} ms/iter -> "
        f"{2*k**3/dt/1e12:.1f} TFLOPs")


def bench_gather(N, B, W):
    table = jax.random.normal(jax.random.key(1), (N, W), jnp.float32)

    def step(c, i):
        idx, acc = c
        rows = jnp.take(table, idx, axis=0, mode="clip")
        s = jnp.sum(rows, axis=1)
        idx = (idx * 1103515245 + 12345 + s.astype(jnp.int32)) % N
        return idx, acc + s

    def init():
        return (jnp.arange(B, dtype=jnp.int32) % N, jnp.zeros((B,), jnp.float32))

    dt = time_iterated(lambda L: loopify(step, init, L), 2, 22)
    gb = B * W * 4 / dt / 1e9
    log(f"gather N={N:7d} W={W:3d} B={B:8d}: {dt*1e3:8.3f} ms/iter "
        f"{gb:7.1f} GB/s ({dt/B*1e9:6.2f} ns/row)")


def bench_lane_traversal():
    """Per-lane traversal on the real bench scene, one full closest-hit wave."""
    import bench as bench_mod
    from physically_based_ray_tracer_tpu.ops.traverse import intersect_closest
    scene, cam, depth = bench_mod.build_bench_scene()
    from physically_based_ray_tracer_tpu.scene.camera import primary_rays
    B = 256 * 256
    ids = jnp.arange(B, dtype=jnp.int32)
    xs = (ids % 256).astype(jnp.float32)
    ys = (ids // 256).astype(jnp.float32)
    o, d = primary_rays(cam, xs, ys, 256, 256)
    bvh = scene.bvh
    log(f"scene: {bvh.n_nodes} nodes, {bvh.n_prims} prim slots, depth={depth}")

    def step(c, i):
        oo, acc = c
        hit = intersect_closest(bvh, oo, d, stack_depth=32, leaf_size=16)
        return oo + 1e-7 * hit.t[:, None], acc + jnp.sum(hit.t)

    def init():
        return o, jnp.float32(0)

    dt = time_iterated(lambda L: loopify(step, init, L), 1, 3)
    log(f"lane closest-hit {B} primary rays: {dt*1e3:.1f} ms/wave "
        f"-> {B/dt/1e6:.2f} Mrays/s")


def bench_wave_traversal():
    import bench as bench_mod
    from physically_based_ray_tracer_tpu.ops.traverse_packet import intersect_closest_wave
    scene, cam, depth = bench_mod.build_bench_scene()
    from physically_based_ray_tracer_tpu.scene.camera import primary_rays
    B = 256 * 256
    ids = jnp.arange(B, dtype=jnp.int32)
    xs = (ids % 256).astype(jnp.float32)
    ys = (ids // 256).astype(jnp.float32)
    o, d = primary_rays(cam, xs, ys, 256, 256)
    bvh = scene.bvh

    def step(c, i):
        oo, acc = c
        hit = intersect_closest_wave(bvh, oo, d, stack_depth=48, leaf_size=16)
        return oo + 1e-7 * hit.t[:, None], acc + jnp.sum(hit.t)

    def init():
        return o, jnp.float32(0)

    dt = time_iterated(lambda L: loopify(step, init, L), 1, 3)
    log(f"wave closest-hit {B} primary rays: {dt*1e3:.1f} ms/wave "
        f"-> {B/dt/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    log(f"device: {jax.devices()[0]}")
    bench_fetch()
    bench_matmul()
    for N in (4096, 65536):
        bench_gather(N, 1 << 18, 16)
    bench_gather(65536, 1 << 18, 8)
    bench_lane_traversal()
    bench_wave_traversal()
    log("done")
