"""Microbenchmark: XLA:TPU gather throughput + while_loop step cost.

Grounds the traversal-kernel design in measured numbers (VERDICT.md round-2
item #2: profile first). Run on the real chip: python experiments/micro_gather.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_gather(N, B, W, coherent=False):
    table = jnp.asarray(np.random.rand(N, W), jnp.float32)
    if coherent:
        idx = jnp.asarray(np.sort(np.random.randint(0, N, B)), jnp.int32)
    else:
        idx = jnp.asarray(np.random.randint(0, N, B), jnp.int32)

    @jax.jit
    def f(table, idx):
        return jnp.take(table, idx, axis=0, mode="clip").sum(axis=1)

    dt = timeit(f, table, idx)
    gb = B * W * 4 / dt / 1e9
    print(f"gather N={N:7d} W={W:3d} B={B:8d} coh={int(coherent)}: "
          f"{dt*1e3:8.3f} ms  {gb:7.1f} GB/s  ({dt/B*1e9:6.2f} ns/row)")


def bench_while_loop_step(B, steps=64):
    """Cost of a per-lane traversal-ish step: 1 gather (B,16) + ~40 flops."""
    N = 4096
    table = jnp.asarray(np.random.rand(N, 16), jnp.float32)
    idx0 = jnp.asarray(np.random.randint(0, N, B), jnp.int32)

    @jax.jit
    def f(table, idx0):
        def body(i, carry):
            idx, acc = carry
            rows = jnp.take(table, idx, axis=0, mode="clip")
            t0 = rows[:, 0:3] * acc[:, None] - rows[:, 3:6]
            t1 = rows[:, 6:9] * acc[:, None] - rows[:, 9:12]
            lo = jnp.max(jnp.minimum(t0, t1), axis=1)
            hi = jnp.min(jnp.maximum(t0, t1), axis=1)
            nxt = jnp.where(lo <= hi, idx * 2 + 1, idx * 2 + 2) % N
            return (nxt, acc + lo)
        idx, acc = jax.lax.fori_loop(0, steps, body, (idx0, jnp.ones((B,))))
        return acc

    dt = timeit(f, table, idx0, iters=5)
    print(f"lane-step B={B:8d} steps={steps}: {dt*1e3:8.3f} ms "
          f"-> {dt/steps/B*1e9:7.2f} ns/lane-step  "
          f"({B*steps/dt/1e6:8.1f} M lane-steps/s)")


def main():
    print(f"device: {jax.devices()[0]}")
    for N in (4096, 65536):
        for W in (8, 16, 128):
            bench_gather(N, 1 << 20, W)
    bench_gather(65536, 1 << 20, 16, coherent=True)
    for B in (1 << 16, 1 << 20):
        bench_while_loop_step(B)


if __name__ == "__main__":
    main()
