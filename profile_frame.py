"""Ablation profile of the full frame pipeline (dev tool)."""
import functools
import sys
import time

import os

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import build_bench_scene
from physically_based_ray_tracer_tpu.utils.timer import ray_count
from physically_based_ray_tracer_tpu.config import RenderConfig
from physically_based_ray_tracer_tpu.render.film import FilmState
from physically_based_ray_tracer_tpu.render.renderer import frame_fn


def run(scene, cam, label, **kw):
    base = dict(width=512, height=512, bounces=4, antialias=True,
                skybox=False, max_stack_depth=32)
    base.update(kw)
    cfg = RenderConfig(**base)
    n_pix = cfg.n_pixels
    pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)
    film = FilmState.zeros(n_pix)
    key = jax.random.key(0)
    frame = jax.jit(functools.partial(frame_fn, cfg=cfg))
    film_out, avg = frame(scene, cam, film=film, key=key, sample=0,
                          pixel_ids=pixel_ids)
    jax.block_until_ready(avg)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        # fold the sample index into the key so each timed frame traces
        # decorrelated, representative paths (ADVICE round-1)
        film_out, avg = frame(scene, cam, film=film_out,
                              key=jax.random.fold_in(key, i),
                              sample=i + 1, pixel_ids=pixel_ids)
        jax.block_until_ready(avg)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    dt = ts[len(ts) // 2]
    rays = ray_count(cfg, n_pix)
    print(f"{label:40s}: {dt*1e3:9.1f} ms   {rays/dt/1e6:7.2f} Mrays/s")


def main():
    scene, cam, depth = build_bench_scene()
    run(scene, cam, "default (chunk=65536)")
    run(scene, cam, "chunk=262144", chunk_pixels=262144)
    run(scene, cam, "chunk=262144, no-sort", chunk_pixels=262144, sort_rays=False)
    run(scene, cam, "chunk=262144, no-AA", chunk_pixels=262144, antialias=False)
    run(scene, cam, "chunk=262144, unlit", chunk_pixels=262144, lighted=False)
    run(scene, cam, "chunk=262144, bounces=1", chunk_pixels=262144, bounces=1)
    run(scene, cam, "chunk=262144, bounces=2", chunk_pixels=262144, bounces=2)


if __name__ == "__main__":
    main()
