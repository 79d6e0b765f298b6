"""Counter-based RNG for deterministic, shardable path tracing.

The reference uses a thread-local xorshift32 seeded with 0x12345678
(``template/tmpl8math.cpp:15-59``) — its renders are not reproducible across
thread schedules. Here every random number is a pure function of
``(frame_seed, pixel_id, sample, bounce, purpose)``: a threefry-derived
per-stream seed is hashed against the *global* pixel id with a PCG-family
integer hash. Because the value depends only on those integers — never on
array shapes or lane positions — renders are bit-identical regardless of
device count, sharding layout, or launch order (the multi-host determinism
requirement of SURVEY.md §7).
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp


class Purpose(enum.IntEnum):
    """Stream selector: which decision in the integrator consumes the sample."""

    AA_JITTER = 0
    LIGHT_TYPE = 1        # stochastic NEE lottery (Core/Renderer.cpp:210)
    LIGHT_SELECT = 2      # which point light for specular (Core/Renderer.cpp:267)
    LOBE_SELECT = 3       # diffuse/specular RIS pick (Core/Renderer.cpp:382)
    BRDF_SAMPLE = 4       # 2D sample for the indirect direction (Core/Renderer.cpp:396)
    AREA_LIGHT = 5        # area-light surface sample
    DIELECTRIC = 6        # reflect/refract russian roulette
    PIXEL_OFFSET = 7      # sub-pixel stratification


def fold(key: jax.Array, *data) -> jax.Array:
    """Fold integer stream identifiers into a key."""
    for d in data:
        key = jax.random.fold_in(key, d)
    return key


def stream_seed(key: jax.Array, sample, bounce, purpose) -> jax.Array:
    """Scalar uint32 seed for one logical random stream."""
    k = fold(key, sample, bounce, int(purpose))
    return jax.random.bits(k, (), dtype=jnp.uint32)


def uniform1(key, pixel_id, sample, bounce, purpose, dtype=jnp.float32):
    """One U[0,1) per lane, a pure function of (key, pixel_id, ids)."""
    seed = stream_seed(key, sample, bounce, purpose)
    h = _pcg_hash(pixel_id.astype(jnp.uint32) ^ seed)
    h = _wang_hash(h + seed)
    return _bits_to_unit(h).astype(dtype)


def uniform2(key, pixel_id, sample, bounce, purpose, dtype=jnp.float32):
    """Two independent U[0,1) per lane, shape ``pixel_id.shape + (2,)``."""
    u1 = uniform1(key, pixel_id, sample, bounce, int(purpose) * 2 + 101, dtype)
    u2 = uniform1(key, pixel_id, sample, bounce, int(purpose) * 2 + 102, dtype)
    return jnp.stack([u1, u2], axis=-1)


def _pcg_hash(x: jax.Array) -> jax.Array:
    """PCG output permutation on a 32-bit LCG step (O'Neill 2014)."""
    state = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


def _wang_hash(x: jax.Array) -> jax.Array:
    """Wang integer finalizer (same family as the reference's seeding hash,
    template/tmpl8math.cpp:20-28), used as a second mixing round."""
    x = (x ^ jnp.uint32(61)) ^ (x >> 16)
    x = x * jnp.uint32(9)
    x = x ^ (x >> 4)
    x = x * jnp.uint32(0x27D4EB2D)
    x = x ^ (x >> 15)
    return x


def _bits_to_unit(bits: jax.Array) -> jax.Array:
    """uint32 -> float32 in [0, 1) with 24-bit mantissa precision."""
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
