"""Per-chunk cost map of the bench frame (round-5, VERDICT #1).

r4's FRAME_GLUE harness slope-timed ONE chunk — `ids = arange(65536)`,
i.e. the TOP 51 rows of the raster-order frame (mostly empty sky above
the spheres) — and baked ids in as a closure constant (letting XLA fold
the primary-ray generation). Both choices bias the per-chunk estimate
LOW, which would manufacture a fake "glue gap" when multiplied by
n_chunks and compared against the measured frame.

This harness slope-times render_sample for EVERY chunk of the production
frame with `ids` as a traced argument (same graph the lax.map body sees),
then compares sum(per-chunk) + film against the measured frame. Whatever
gap remains after honest per-chunk accounting is real dispatch glue.

Run: python experiments/chunk_costs.py [--bf16] -> docs/CHUNK_COSTS_r05.json
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax
    import jax.numpy as jnp
    import numpy as np
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
    from physically_based_ray_tracer_tpu.render.integrator import render_sample
    from physically_based_ray_tracer_tpu.render.renderer import frame_fn

    precision = "bf16" if "--bf16" in sys.argv else "f32"
    cfg = RenderConfig(width=1280, height=720, bounces=4, antialias=True,
                       skybox=False, max_stack_depth=32, traversal="pallas",
                       one_shadow_ray=True, leaf_precision=precision)
    scene, cam, _ = build_bench_scene()
    key = jax.random.key(0)
    C = cfg.chunk_pixels
    n_pix = cfg.n_pixels
    n_chunks = -(-n_pix // C)
    out = {"precision": precision, "n_chunks": n_chunks, "chunk_pixels": C}

    # repeat(n) with ids TRACED (matches the lax.map body: nothing folds)
    def make_repeat(n):
        @jax.jit
        def f(c, ids):
            def body(i, c):
                color, t = render_sample(scene, cam, cfg, key,
                                         c[0].astype(jnp.int32), ids)
                return jnp.stack([jnp.sum(color) * 1e-9 + c[0] + 1.0, c[1]])
            return jax.lax.fori_loop(0, n, body, c)
        return f

    r1, r8 = make_repeat(1), make_repeat(8)
    init = jnp.zeros((2,), jnp.float32)

    per_chunk = []
    for ci in range(n_chunks):
        lo = ci * C
        ids = jnp.arange(lo, min(lo + C, n_pix), dtype=jnp.int32)
        if ids.shape[0] < C:  # frame_fn pads the tail chunk
            ids = jnp.pad(ids, (0, C - ids.shape[0]), mode="edge")
        t1 = wall(r1, init, ids)
        t8 = wall(r8, init, ids)
        ms = max((t8 - t1) / 7.0, 0.0)
        per_chunk.append(round(ms, 2))
        print(f"chunk {ci:2d}: {ms:7.2f} ms  (t1={t1:.1f} t8={t8:.1f})",
              flush=True)

    out["per_chunk_ms"] = per_chunk
    out["sum_chunks_ms"] = round(sum(per_chunk), 1)

    # measured full frame (same config), for the honest comparison
    pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)
    film = film_mod.FilmState.zeros(n_pix)
    frame = jax.jit(functools.partial(frame_fn, cfg=cfg))
    film_out, avg = frame(scene, cam, film=film, key=key, sample=0,
                          pixel_ids=pixel_ids)
    sync(avg)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        film_out, avg = frame(scene, cam, film=film_out, key=key,
                              sample=i + 1, pixel_ids=pixel_ids)
        sync(avg)
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    out["frame_ms"] = round(ts[len(ts) // 2], 1)
    out["dispatch_glue_ms"] = round(out["frame_ms"] - out["sum_chunks_ms"], 1)
    out["note"] = ("per_chunk_ms are slope costs with traced ids; "
                   "dispatch_glue_ms is what lax.map/film/dispatch adds "
                   "beyond the sum of honest chunk costs")
    docs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs")
    with open(os.path.join(docs, f"CHUNK_COSTS_r05_{precision}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)

    # --- jax.profiler trace of ONE frame (may not be supported over the
    # axon relay; best-effort, failure must not kill the sweep above) ------
    try:
        prof_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "profiles", f"frame_r05_{precision}")
        os.makedirs(prof_dir, exist_ok=True)
        with jax.profiler.trace(prof_dir):
            film_out, avg = frame(scene, cam, film=film_out, key=key,
                                  sample=99, pixel_ids=pixel_ids)
            sync(avg)
        print("profiler trace written to", prof_dir, flush=True)
    except Exception as e:  # noqa: BLE001
        print("profiler trace failed:", repr(e), flush=True)


if __name__ == "__main__":
    main()
