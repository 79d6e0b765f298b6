"""Light sets as SoA device arrays.

The reference's four light types (SURVEY.md §2.1 "Lights"):

* 4 SIMD point lights living as SoA arrays on the Renderer
  (Core/Renderer.h:80-88), illumination color * cos / dist
  (Core/Renderer.cpp:220-268 — note the 1/dist, not 1/dist^2, falloff);
* directional light evaluated toward a *position* (Core/Renderer.cpp:270-286);
* spot light with a hard dot(L, rot) > 0.9 cone and 1/d^2 falloff
  (Core/Renderer.cpp:287-310);
* area light (declared, never instantiated by the reference Scene —
  Core/AreaLight.cpp:46-56) — here a first-class rectangular emitter with
  uniform sampling for the Cornell-box config.

Here the SIMD unions become plain ``(N, 3)`` arrays: XLA vectorises the
evaluation over lights x rays without hand-written intrinsics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class LightSet(NamedTuple):
    """All scene lights; counts are static (array shapes)."""

    point_pos: jnp.ndarray     # (NP, 3)
    point_color: jnp.ndarray   # (NP, 3)
    point_active: jnp.ndarray  # (NP,) f32 0/1 (mirrors activeLights, Renderer.h:82)
    dir_pos: jnp.ndarray       # (ND, 3) — a position, as in the reference
    dir_color: jnp.ndarray     # (ND, 3)
    spot_pos: jnp.ndarray      # (NS, 3)
    spot_color: jnp.ndarray    # (NS, 3)
    spot_rot: jnp.ndarray      # (NS, 3) cone axis (compared raw to L, Core/Renderer.cpp:295)
    area_pos: jnp.ndarray      # (NA, 3) rectangle center
    area_color: jnp.ndarray    # (NA, 3) radiance
    area_u: jnp.ndarray        # (NA, 3) half-edge vector 1
    area_v: jnp.ndarray        # (NA, 3) half-edge vector 2

    @staticmethod
    def make(point_pos=None, point_color=None, point_active=None,
             dir_pos=None, dir_color=None,
             spot_pos=None, spot_color=None, spot_rot=None,
             area_pos=None, area_color=None, area_u=None, area_v=None) -> "LightSet":
        def arr(x, n3=3):
            if x is None:
                return jnp.zeros((0, n3), jnp.float32)
            a = jnp.asarray(x, jnp.float32)
            return a.reshape(-1, n3)

        pp = arr(point_pos)
        pa = (jnp.ones((pp.shape[0],), jnp.float32) if point_active is None
              else jnp.asarray(point_active, jnp.float32).reshape(-1))
        return LightSet(
            point_pos=pp, point_color=arr(point_color), point_active=pa,
            dir_pos=arr(dir_pos), dir_color=arr(dir_color),
            spot_pos=arr(spot_pos), spot_color=arr(spot_color), spot_rot=arr(spot_rot),
            area_pos=arr(area_pos), area_color=arr(area_color),
            area_u=arr(area_u), area_v=arr(area_v))

    @property
    def n_point(self):
        return self.point_pos.shape[0]

    @property
    def n_dir(self):
        return self.dir_pos.shape[0]

    @property
    def n_spot(self):
        return self.spot_pos.shape[0]

    @property
    def n_area(self):
        return self.area_pos.shape[0]

    def pad_points(self, n: int = 4) -> "LightSet":
        """Pad point lights to the reference's fixed POINTLIGHTS=4 slots with
        inactive zero lights (template/common.h:17)."""
        k = self.point_pos.shape[0]
        if k >= n:
            return self
        pad = n - k
        return self._replace(
            point_pos=jnp.concatenate([self.point_pos, jnp.zeros((pad, 3), jnp.float32)]),
            point_color=jnp.concatenate([self.point_color, jnp.zeros((pad, 3), jnp.float32)]),
            point_active=jnp.concatenate([self.point_active, jnp.zeros((pad,), jnp.float32)]))


def sample_area_rect(lights: LightSet, idx, u2):
    """Uniform point on rectangular area light ``idx``; returns (point, normal, pdf_area).

    A genuine area sampler (the reference's RandomPointOnLight averages 5
    jittered points around a hardcoded plane, Core/AreaLight.cpp:46-56 —
    replicated separately as `reference_random_point_on_light`).
    """
    pos = jnp.take(lights.area_pos, idx, axis=0, mode="clip")
    eu = jnp.take(lights.area_u, idx, axis=0, mode="clip")
    ev = jnp.take(lights.area_v, idx, axis=0, mode="clip")
    p = pos + (2.0 * u2[..., 0:1] - 1.0) * eu + (2.0 * u2[..., 1:2] - 1.0) * ev
    n = jnp.cross(eu, ev)
    area = 4.0 * jnp.linalg.norm(n, axis=-1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    pdf = 1.0 / jnp.maximum(area, 1e-20)
    return p, n, pdf


def reference_random_point_on_light(u_pairs):
    """Bias-for-bias replica of AreaLight::RandomPointOnLight
    (Core/AreaLight.cpp:46-56): average of jittered points on the plane y=3,
    x,z in [-1, 0); note the reference divides by ``samples`` (5) while
    summing ``samples+1`` (6) points — replicated faithfully.

    u_pairs: (..., 6, 2) uniforms.
    """
    pts = jnp.stack([
        u_pairs[..., 0] - 1.0,
        jnp.full(u_pairs.shape[:-1], 3.0, u_pairs.dtype),
        u_pairs[..., 1] - 1.0,
    ], axis=-1)
    return jnp.sum(pts, axis=-2) / 5.0


def lights_from_reference_json(scene_dir: str) -> "LightSet":
    """Assemble a LightSet from reference-format JSON directories
    (assets/scene1/{pointlights,directionallights,spotlights}) — the formats
    of Core/LightTransform.cpp:14-24."""
    import json
    import os

    def read_dir(sub):
        d = os.path.join(scene_dir, sub)
        out = []
        if os.path.isdir(d):
            for f in sorted(os.listdir(d)):
                if f.endswith(".json"):
                    with open(os.path.join(d, f)) as fh:
                        out.append(json.load(fh))
        return out

    def pcr(rec, k1, k2, k3):
        return [rec.get(k1, 0.0), rec.get(k2, 0.0), rec.get(k3, 0.0)]

    points = read_dir("pointlights")
    dirs = read_dir("directionallights")
    spots = read_dir("spotlights")
    areas = read_dir("arealights")

    def stack(recs, keys):
        if not recs:
            return None
        return np.asarray([pcr(r, *keys) for r in recs], np.float32)

    ls = LightSet.make(
        point_pos=stack(points, ("pX", "pY", "pZ")),
        point_color=stack(points, ("cX", "cY", "cZ")),
        dir_pos=stack(dirs, ("pX", "pY", "pZ")),
        dir_color=stack(dirs, ("cX", "cY", "cZ")),
        spot_pos=stack(spots, ("pX", "pY", "pZ")),
        spot_color=stack(spots, ("cX", "cY", "cZ")),
        spot_rot=stack(spots, ("rX", "rY", "rZ")),
        area_pos=stack(areas, ("pX", "pY", "pZ")),
        area_color=stack(areas, ("cX", "cY", "cZ")),
        area_u=(np.tile([1.0, 0, 0], (len(areas), 1)).astype(np.float32) if areas else None),
        area_v=(np.tile([0, 0, 1.0], (len(areas), 1)).astype(np.float32) if areas else None),
    )
    return ls
