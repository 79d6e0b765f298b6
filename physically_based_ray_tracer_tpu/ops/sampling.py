"""Low-level importance samplers (pure jnp, fully batched).

Math parity with Core/BRDF.cpp: cosine hemisphere (:62-82), GGX VNDF both
Heitz and Dupuy/Benyoub spherical-cap variants (:224-269), Walter sampling for
GGX and Beckmann (:293-324). All functions map over leading batch dims; random
inputs ``u`` have trailing dim 2.
"""

from __future__ import annotations

import jax.numpy as jnp

from physically_based_ray_tracer_tpu.utils.math import cross, lerp, normalize

PI = 3.141592653589
TWO_PI = 2.0 * PI
ONE_OVER_PI = 1.0 / PI


def sample_hemisphere_cosine(u: jnp.ndarray):
    """Cosine-weighted hemisphere about +Z; returns (dir, pdf).

    Mirrors BRDF::sampleHemisphere (Core/BRDF.cpp:62-76): dir z = sqrt(1-u1),
    pdf = z/pi.
    """
    a = jnp.sqrt(jnp.maximum(u[..., 0], 1e-12))
    b = TWO_PI * u[..., 1]
    d = jnp.stack([a * jnp.cos(b), a * jnp.sin(b),
                   jnp.sqrt(jnp.maximum(1.0 - u[..., 0], 1e-12))], axis=-1)
    return d, d[..., 2] * ONE_OVER_PI


def sample_ggx_vndf_heitz(ve: jnp.ndarray, alpha2d: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Visible-NDF GGX sample (Heitz 2018); Core/BRDF.cpp:244-268.

    ``ve`` is the view vector in local (+Z = normal) space, ``alpha2d`` the
    anisotropic roughness pair ``(..., 2)``. PDF is G1(NdotV)*D / (4 NdotV)
    after the reflection Jacobian.
    """
    ax = alpha2d[..., 0]
    ay = alpha2d[..., 1]
    vh = normalize(jnp.stack([ax * ve[..., 0], ay * ve[..., 1], ve[..., 2]], axis=-1))

    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv_len = jnp.where(lensq > 0.0, 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-30)), 0.0)
    t1 = jnp.where(
        (lensq > 0.0)[..., None],
        jnp.stack([-vh[..., 1] * inv_len, vh[..., 0] * inv_len, jnp.zeros_like(inv_len)], axis=-1),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], dtype=ve.dtype), vh.shape),
    )
    t2 = cross(vh, t1)

    r = jnp.sqrt(jnp.maximum(u[..., 0], 1e-12))
    phi = TWO_PI * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = lerp(jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 1e-12)), p2, s)

    nh = (p1[..., None] * t1 + p2[..., None] * t2
          + jnp.sqrt(jnp.maximum(1e-12, 1.0 - p1 * p1 - p2 * p2))[..., None] * vh)
    return normalize(jnp.stack(
        [ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(0.0, nh[..., 2])], axis=-1))


def sample_ggx_vndf_spherical_caps(ve: jnp.ndarray, alpha2d: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """VNDF via spherical caps (Dupuy & Benyoub 2023); Core/BRDF.cpp:230-242."""
    ax = alpha2d[..., 0]
    ay = alpha2d[..., 1]
    vh = normalize(jnp.stack([ax * ve[..., 0], ay * ve[..., 1], ve[..., 2]], axis=-1))
    phi = TWO_PI * u[..., 0]
    z = (1.0 - u[..., 1]) * (1.0 + vh[..., 2]) - vh[..., 2]
    sin_theta = jnp.sqrt(jnp.clip(1.0 - z * z, 1e-12, 1.0))
    nh = jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), z], axis=-1) + vh
    return normalize(jnp.stack(
        [ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(0.0, nh[..., 2])], axis=-1))


def sample_ggx_walter(vlocal: jnp.ndarray, alpha2d: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Classic NDF sampling for GGX (Walter 2007); Core/BRDF.cpp:310-324.

    PDF is D * NdotH (before the reflection Jacobian).
    """
    del vlocal  # independent of view direction
    alpha = 0.5 * (alpha2d[..., 0] + alpha2d[..., 1])
    a2 = alpha * alpha
    cos2 = (1.0 - u[..., 0]) / ((a2 - 1.0) * u[..., 0] + 1.0)
    cos_t = jnp.sqrt(cos2)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos2, 1e-12))
    phi = TWO_PI * u[..., 1]
    return normalize(jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1))


def sample_beckmann_walter(vlocal: jnp.ndarray, alpha2d: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Beckmann NDF sampling (Walter 2007 eq. 28/29); Core/BRDF.cpp:293-308."""
    del vlocal
    alpha = 0.5 * (alpha2d[..., 0] + alpha2d[..., 1])
    tan2 = -(alpha * alpha) * jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-30))
    phi = TWO_PI * u[..., 1]
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-12))
    return normalize(jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1))


def walters_trick(alpha, ndotv):
    """Roughness adjustment limiting Walter-sampling weight (~4); Core/BRDF.cpp:279-282."""
    return (1.2 - 0.2 * jnp.sqrt(jnp.abs(ndotv))) * alpha
