"""Film: accumulation buffer with the reference's depth-keyed reset.

Mirror of the accumulator logic in Renderer::Tick (Core/Renderer.cpp:73-105):
gamma (sqrt) is applied to the frame's trace result BEFORE accumulation; a
pixel's running mean resets when the primary-hit distance changes by more
than EPSILON (the reference's cheap temporal-invalidation heuristic, kept as
an option per SURVEY.md §7 — plain accumulation is ``depth_keyed=False``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from physically_based_ray_tracer_tpu.config import EPSILON, RenderConfig


class FilmState(NamedTuple):
    accum: jnp.ndarray    # (Npix, 3) accumulated (post-gamma) color
    spp: jnp.ndarray      # (Npix,) samples in the running mean
    dist: jnp.ndarray     # (Npix,) last primary-hit distance

    @staticmethod
    def zeros(n_pixels: int, dtype=jnp.float32) -> "FilmState":
        return FilmState(
            accum=jnp.zeros((n_pixels, 3), dtype),
            spp=jnp.zeros((n_pixels,), dtype),
            dist=jnp.full((n_pixels,), -1.0, dtype))


def update(film: FilmState, color, primary_t, cfg: RenderConfig,
           depth_keyed: bool | None = None):
    """Accumulate one frame; returns (new_film, average_color).

    ``color`` is the raw linear trace result; gamma is applied here first,
    matching the reference order (gamma -> accumulate, Core/Renderer.cpp:73-99).
    ``depth_keyed`` defaults to ``cfg.depth_keyed_accum`` so the plain
    running mean is reachable from RenderConfig.
    """
    if depth_keyed is None:
        depth_keyed = cfg.depth_keyed_accum
    if cfg.gamma_corrected:
        # double-where keeps sqrt'(0)=inf out of the backward pass
        pos = color > 0.0
        color = jnp.where(pos, jnp.sqrt(jnp.where(pos, color, 1.0)), 0.0)

    if not cfg.accumulate:
        ones = jnp.ones_like(film.spp)
        return FilmState(accum=color, spp=ones, dist=primary_t), color

    if depth_keyed:
        same = jnp.abs(film.dist - primary_t) < EPSILON
    else:
        same = jnp.ones_like(film.spp, bool)
    new_spp = jnp.where(same, film.spp + 1.0, 1.0)
    new_accum = jnp.where(same[:, None], film.accum + color, color)
    avg = new_accum / new_spp[:, None]
    return FilmState(accum=new_accum, spp=new_spp, dist=primary_t), avg
