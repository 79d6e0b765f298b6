"""Vector/matrix helpers shared by the whole framework.

Replaces the reference's ``template/tmpl8math.h`` (OpenCL-style float3/mat4)
with broadcasting jnp operations over ``(..., 3)`` / ``(..., 4, 4)`` arrays.
Quaternions are ``(..., 4)`` in ``(x, y, z, w)`` order, matching the layout
used by ``Core/BRDF.cpp:43-60``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis, keepdims dropped."""
    return jnp.sum(a * b, axis=-1)


def dot3(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(v * v, axis=-1))


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Safe normalize: returns v/|v| with a tiny clamp against /0."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jnp.where(n2 > 0, 1.0 / jnp.sqrt(jnp.maximum(n2, eps)), 0.0)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def lerp(a, b, t):
    return a + (b - a) * t


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror direction: d - 2*(d.n)*n (d points toward the surface)."""
    return d - 2.0 * dot3(d, n) * n


def refract(d: jnp.ndarray, n: jnp.ndarray, eta: float) -> jnp.ndarray:
    """Snell refraction, semantics of ``Renderer::refract`` (Core/Renderer.cpp:522-550).

    ``eta`` is the material IOR (the function flips the ratio depending on the
    ray/normal orientation). Returns zeros on total internal reflection.
    """
    cosi = jnp.clip(dot3(d, n), -1.0, 1.0)
    entering = cosi <= 0.0
    eta_ratio = jnp.where(entering, 1.0 / eta, eta)
    cos_theta = jnp.abs(cosi)
    k = 1.0 - eta_ratio * eta_ratio * (1.0 - cos_theta * cos_theta)
    # Reference computes: etaRatio * (d - n * cosTheta) - n*sqrt(k) with
    # cosTheta = |cosi| (replicated verbatim, including its sign convention).
    # sqrt arg sanitised pre-branch so TIR lanes can't emit inf cotangents.
    k_safe = jnp.where(k > 0.0, k, 1.0)
    refr = eta_ratio * (d - n * cos_theta) - n * jnp.sqrt(k_safe)
    return jnp.where(k <= 0.0, jnp.zeros_like(d), refr)


# ---------------------------------------------------------------------------
# Quaternions (x, y, z, w)
# ---------------------------------------------------------------------------

def quat_rotation_to_z(v: jnp.ndarray) -> jnp.ndarray:
    """Quaternion taking unit vector ``v`` to +Z. Mirrors Core/BRDF.cpp:43-49."""
    q = jnp.stack([v[..., 1], -v[..., 0], jnp.zeros_like(v[..., 0]), 1.0 + v[..., 2]], axis=-1)
    qn = normalize(q)
    flip = (v[..., 2:3] < -0.99999)
    identity_flip = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=v.dtype), qn.shape)
    return jnp.where(flip, identity_flip, qn)


def quat_invert(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (Core/BRDF.cpp:51-54)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate point by quaternion (Core/BRDF.cpp:56-60)."""
    axis = q[..., :3]
    w = q[..., 3:4]
    return (2.0 * dot3(axis, v) * axis
            + (w * w - dot3(axis, axis)) * v
            + 2.0 * w * jnp.cross(axis, v))


def quat_from_euler(euler_xyz) -> np.ndarray:
    """GLM-convention quaternion from Euler angles in radians (pitch-yaw-roll).

    Matches ``glm::quat(glm::vec3(rx, ry, rz))`` used by
    ``GameObject::Synchronise`` (Core/GameObject.cpp:60-62).
    """
    rx, ry, rz = [np.asarray(e, dtype=np.float64) for e in euler_xyz]
    cx, sx = np.cos(rx * 0.5), np.sin(rx * 0.5)
    cy, sy = np.cos(ry * 0.5), np.sin(ry * 0.5)
    cz, sz = np.cos(rz * 0.5), np.sin(rz * 0.5)
    # glm::quat(eulerAngles) composes as q = qz * qy * qx? GLM uses
    # pitch(x), yaw(y), roll(z) with q.w = cx*cy*cz + sx*sy*sz etc.
    w = cx * cy * cz + sx * sy * sz
    x = sx * cy * cz - cx * sy * sz
    y = cx * sy * cz + sx * cy * sz
    z = cx * cy * sz - sx * sy * cz
    return np.stack([x, y, z, w], axis=-1)


def quat_to_matrix(q) -> np.ndarray:
    """3x3 rotation matrix from quaternion (x, y, z, w)."""
    q = np.asarray(q, dtype=np.float64)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    m = np.empty(q.shape[:-1] + (3, 3), dtype=np.float64)
    m[..., 0, 0] = 1 - 2 * (y * y + z * z)
    m[..., 0, 1] = 2 * (x * y - w * z)
    m[..., 0, 2] = 2 * (x * z + w * y)
    m[..., 1, 0] = 2 * (x * y + w * z)
    m[..., 1, 1] = 1 - 2 * (x * x + z * z)
    m[..., 1, 2] = 2 * (y * z - w * x)
    m[..., 2, 0] = 2 * (x * z - w * y)
    m[..., 2, 1] = 2 * (y * z + w * x)
    m[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return m


# ---------------------------------------------------------------------------
# 4x4 transforms (host-side, numpy): TRS composition used by GameObjects
# ---------------------------------------------------------------------------

def compose_trs(position, rotation_euler, scale) -> np.ndarray:
    """T * R(quat-from-euler) * S as a 4x4 row-vector-style matrix.

    Mirrors ``GameObject::Synchronise`` (Core/GameObject.cpp:55-69): the
    rotation comes from a GLM Euler-angle quaternion, scale is per-axis.
    Points transform as ``M @ [p, 1]``.
    """
    t = np.eye(4)
    t[:3, 3] = np.asarray(position, dtype=np.float64)
    r = np.eye(4)
    r[:3, :3] = quat_to_matrix(quat_from_euler(np.asarray(rotation_euler, dtype=np.float64)))
    s = np.diag(list(np.asarray(scale, dtype=np.float64)) + [1.0])
    return (t @ r @ s).astype(np.float32)


def transform_points(m: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Apply 4x4 to (N,3) points."""
    return pts @ np.asarray(m[:3, :3]).T + np.asarray(m[:3, 3])


def transform_vectors(m: np.ndarray, vecs: np.ndarray) -> np.ndarray:
    """Apply the linear part of a 4x4 to (N,3) vectors (no translation)."""
    return vecs @ np.asarray(m[:3, :3]).T


def inverse_transpose_3x3(m: np.ndarray) -> np.ndarray:
    """Normal matrix: inverse-transpose of the upper 3x3 (Core/Scene.cpp:55)."""
    return np.linalg.inv(np.asarray(m[:3, :3], dtype=np.float64)).T.astype(np.float32)


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """Exact piecewise sRGB EOTF (Core/BRDF.cpp:527-534, Core/Scene.cpp:256-263)."""
    return jnp.where(c <= 0.04045, c / 12.92, jnp.power((c + 0.055) / 1.055, 2.4))


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055)
