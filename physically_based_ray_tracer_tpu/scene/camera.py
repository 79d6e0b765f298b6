"""Pinhole camera + Panini projection + equirect skydome sampling.

Parity target: Core/Camera.cpp. The camera is a small differentiable pytree
(pos/target participate in gradients for the inverse-rendering configs);
derived basis vectors and the virtual screen plane are recomputed in pure
functions, replacing the reference's mutable member state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from physically_based_ray_tracer_tpu.utils.math import cross, dot, length, normalize

PI = 3.141592653589


class Camera(NamedTuple):
    """Differentiable camera parameters.

    The screen plane sits at distance 2 along ``ahead`` with half-extents
    (aspect, 1) — exactly the construction of Core/Camera.cpp:29-37 (the
    ``fov`` field only affects the Panini path, as in the reference).
    """

    pos: jnp.ndarray          # (3,)
    target: jnp.ndarray       # (3,)
    fov: jnp.ndarray          # () degrees — Panini only (Core/Camera.h:23)
    distortion: jnp.ndarray   # () Panini distortion parameter

    @staticmethod
    def make(pos, target, fov=40.0, distortion=40.0) -> "Camera":
        return Camera(jnp.asarray(pos, jnp.float32), jnp.asarray(target, jnp.float32),
                      jnp.asarray(fov, jnp.float32), jnp.asarray(distortion, jnp.float32))


class CameraBasis(NamedTuple):
    ahead: jnp.ndarray
    right: jnp.ndarray
    up: jnp.ndarray
    top_left: jnp.ndarray
    top_right: jnp.ndarray
    bottom_left: jnp.ndarray


def camera_basis(cam: Camera, aspect: float) -> CameraBasis:
    """Basis + screen-plane corners (Core/Camera.cpp:29-36)."""
    tmp_up = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    ahead = normalize(cam.target - cam.pos)
    right = normalize(cross(ahead, tmp_up))
    up = normalize(cross(right, ahead))
    center = cam.pos + ahead * 2.0
    return CameraBasis(
        ahead=ahead, right=right, up=up,
        top_left=center - aspect * right + up,
        top_right=center + aspect * right + up,
        bottom_left=center - aspect * right - up)


def primary_rays(cam: Camera, xs, ys, width: int, height: int,
                 panini: bool = False):
    """Primary ray origins/directions for (fractional) pixel coords.

    Mirrors Camera::GetPrimaryRay (Core/Camera.cpp:113-139): u = x/W, v = y/H,
    P lerped over the plane corners. ``xs``/``ys`` are float arrays of any
    matching shape (AA jitter adds fractions, Core/Renderer.cpp:61).
    """
    basis = camera_basis(cam, aspect=width / height)
    u = xs * (1.0 / width)
    v = ys * (1.0 / height)
    p = (basis.top_left[None, :]
         + u[..., None] * (basis.top_right - basis.top_left)[None, :]
         + v[..., None] * (basis.bottom_left - basis.top_left)[None, :])
    d = normalize(p - cam.pos)
    if panini:
        ndc = jnp.stack([2.0 * u - 1.0, 1.0 - 2.0 * v], axis=-1)
        pd = panini_projection(ndc, cam.fov * (PI / 180.0), cam.distortion)
        mag = length(p - cam.pos)
        world = (basis.right[None, :] * (pd[..., 0] * mag)[..., None]
                 + basis.up[None, :] * (pd[..., 1] * mag)[..., None]
                 + basis.ahead[None, :] * (pd[..., 2] * mag)[..., None])
        d = normalize(world)
    o = jnp.broadcast_to(cam.pos, d.shape)
    return o, d


def panini_projection(ndc: jnp.ndarray, fov_rad, distortion):
    """Panini cylindrical-stereographic projection (Core/Camera.cpp:81-111)."""
    fo = PI / 2 - fov_rad * 0.5
    f = jnp.cos(fo) / jnp.sin(fo) * 2.0
    f2 = f * f
    d = distortion
    d2 = d * d
    b = (jnp.sqrt(jnp.maximum(0.0, (d + d2) * (d + d2) * (f2 + f2 * f2)))
         - (d * f + f)) / (d2 + d2 * f2 - 1.0)
    h = ndc[..., 0] * b
    v = ndc[..., 1] * b
    h2 = h * h
    k = h2 / ((d + 1.0) * (d + 1.0))
    k2 = k * k
    discr = jnp.maximum(0.0, k2 * d2 - (k + 1.0) * (k * d2 - 1.0))
    cos_phi = (-k * d + jnp.sqrt(discr)) / (k + 1.0)
    s_big = (d + 1.0) / (d + cos_phi)
    tan_theta = v / s_big
    sin_phi = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_phi * cos_phi))
    sin_phi = jnp.where(h < 0.0, -sin_phi, sin_phi)
    s = 1.0 / jnp.sqrt(1.0 + tan_theta * tan_theta)
    return jnp.stack([sin_phi * s, tan_theta * s, cos_phi * s], axis=-1)


def sample_skybox(sky: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Equirect HDR skydome, bilinear-filtered (Core/Camera.cpp:43-74).

    sky: (H, W, 3) float32; d: (..., 3) unit directions.
    """
    h, w = sky.shape[0], sky.shape[1]
    u = 0.5 + jnp.arctan2(d[..., 2], d[..., 0]) / (2.0 * PI)
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / PI
    ut = u * w
    vt = v * h
    u0 = jnp.floor(ut).astype(jnp.int32) % w
    v0 = jnp.floor(vt).astype(jnp.int32) % h
    u1 = (u0 + 1) % w
    v1 = (v0 + 1) % h
    du = (ut - jnp.floor(ut))[..., None]
    dv = (vt - jnp.floor(vt))[..., None]
    flat = sky.reshape(-1, 3)
    c00 = jnp.take(flat, u0 + v0 * w, axis=0, mode="clip")
    c01 = jnp.take(flat, u1 + v0 * w, axis=0, mode="clip")
    c10 = jnp.take(flat, u0 + v1 * w, axis=0, mode="clip")
    c11 = jnp.take(flat, u1 + v1 * w, axis=0, mode="clip")
    i0 = c00 + du * (c01 - c00)
    i1 = c10 + du * (c11 - c10)
    return i0 + dv * (i1 - i0)
