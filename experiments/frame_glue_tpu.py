"""Locate the ~half of the bench frame that per-phase profiling does not
account for (round-4 finding: phase sum ~0.76 s vs 1.52 s full frame).

Slope-times three granularities on the production bench config:
  chunk_full      one production chunk through render_sample (AA pair,
                  trace_paths, AA average) — everything but film/assembly
  chunk_trace     trace_paths alone on the chunk's 131072 AA lanes
  film_update     film accumulation update at full-frame width
Whatever chunk_full exceeds the phase sum by is integrator glue; whatever
the real frame exceeds n_chunks*chunk_full + film by is lax.map/assembly.

Run: python experiments/frame_glue_tpu.py  -> docs/FRAME_GLUE_r04.json
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax
    import numpy as np
    import jax.numpy as jnp
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(jnp.sum(jnp.ravel(leaf)[:1].astype(jnp.float32))))


def wall(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


def slope_of(body, init, K=8):
    import jax

    def repeat(n):
        @jax.jit
        def f(c):
            return jax.lax.fori_loop(0, n, lambda i, c: body(c), c)
        return f
    t1 = wall(repeat(1), init)
    tk = wall(repeat(K), init)
    return max((tk - t1) / (K - 1), 0.0)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_bench_scene
    from physically_based_ray_tracer_tpu.config import RenderConfig
    from physically_based_ray_tracer_tpu.render import film as film_mod
    from physically_based_ray_tracer_tpu.render.integrator import (
        render_sample, trace_paths)
    from physically_based_ray_tracer_tpu.scene.camera import primary_rays
    from physically_based_ray_tracer_tpu.utils import rng
    from physically_based_ray_tracer_tpu.utils.rng import Purpose

    cfg = RenderConfig(width=1280, height=720, bounces=4, antialias=True,
                       skybox=False, max_stack_depth=32, traversal="pallas",
                       one_shadow_ray=True)
    scene, cam, _ = build_bench_scene()
    key = jax.random.key(0)
    C = cfg.chunk_pixels                       # 65536 pixels/chunk
    ids = jnp.arange(C, dtype=jnp.int32)
    out = {}

    # chunk_full: render_sample at production chunk width
    def chunk_full(c):
        color, t = render_sample(scene, cam, cfg, key, c[0].astype(jnp.int32),
                                 ids)
        return jnp.stack([jnp.sum(color), c[0] + 1.0])

    out["chunk_full_ms"] = round(
        slope_of(chunk_full, jnp.zeros((2,), jnp.float32)), 2)
    print("chunk_full", out["chunk_full_ms"], flush=True)

    # chunk_trace: trace_paths on the chunk's AA-doubled lanes
    xs = (ids % cfg.width).astype(jnp.float32)
    ys = (ids // cfg.width).astype(jnp.float32)
    o1, d1 = primary_rays(cam, xs, ys, cfg.width, cfg.height)
    j = rng.uniform2(key, ids, 0, 0, Purpose.AA_JITTER)
    o2, d2 = primary_rays(cam, xs + j[:, 0], ys + j[:, 1],
                          cfg.width, cfg.height)
    o = jnp.concatenate([o1, o2])
    d = jnp.concatenate([d1, d2])
    pid = jnp.concatenate([ids, ids + cfg.n_pixels])

    def chunk_trace(c):
        rad, _ = trace_paths(scene, cfg, o, d, pid, key,
                             c[0].astype(jnp.int32))
        return jnp.stack([jnp.sum(rad), c[0] + 1.0])

    out["chunk_trace_ms"] = round(
        slope_of(chunk_trace, jnp.zeros((2,), jnp.float32)), 2)
    print("chunk_trace", out["chunk_trace_ms"], flush=True)

    # film update at frame width
    n_pix = cfg.n_pixels
    film = film_mod.FilmState.zeros(n_pix)
    color = jnp.ones((n_pix, 3), jnp.float32) * 0.5
    pt = jnp.ones((n_pix,), jnp.float32)

    def film_body(c):
        f2, avg = film_mod.update(
            film_mod.FilmState(film.accum + c[0], film.spp, film.dist),
            color, pt, cfg)
        return jnp.stack([jnp.sum(avg), c[0] + 1.0])

    out["film_update_ms"] = round(
        slope_of(film_body, jnp.zeros((2,), jnp.float32)), 2)
    print("film_update", out["film_update_ms"], flush=True)

    n_chunks = -(-n_pix // C)
    out["n_chunks"] = n_chunks
    out["est_frame_from_chunks_ms"] = round(
        out["chunk_full_ms"] * n_chunks + out["film_update_ms"], 1)
    out["glue_inside_render_sample_ms_per_chunk"] = round(
        out["chunk_full_ms"] - out["chunk_trace_ms"], 2)
    out["note"] = ("compare est_frame_from_chunks_ms with the measured "
                   "bench frame (~1520 ms): any excess is lax.map/dispatch "
                   "overhead; chunk_full - chunk_trace is AA-pair raygen + "
                   "averaging; chunk_trace - phase-sum is integrator glue "
                   "(refine, NEE shaping, sorts beyond sort_only, masks)")
    docs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs")
    with open(os.path.join(docs, "FRAME_GLUE_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
