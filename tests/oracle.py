"""Scalar numpy oracle implementing the reference Trace semantics.

An independent float64 re-derivation of the deterministic subset of
``Renderer::Trace`` (Core/Renderer.cpp:150-406): primary ray construction,
brute-force closest hit, smooth shading normals, the GGX+Lambert combined
BRDF (Core/BRDF.cpp default config), non-stochastic directional NEE with
occlusion (Core/Renderer.cpp:312-326), and sqrt gamma. Used by
tests/test_parity.py to validate the wavefront integrator end-to-end.
"""

from __future__ import annotations

import numpy as np

MIN_F0 = 0.4
EPSILON = 0.01
LUM = np.asarray([0.2126, 0.7152, 0.0722])


def normalize(v):
    return v / np.linalg.norm(v)


def primary_ray(cam_pos, cam_target, width, height, x, y):
    ahead = normalize(np.asarray(cam_target, float) - cam_pos)
    right = normalize(np.cross(ahead, [0.0, 1.0, 0.0]))
    up = normalize(np.cross(right, ahead))
    aspect = width / height
    top_left = cam_pos + ahead * 2 - aspect * right + up
    top_right = cam_pos + ahead * 2 + aspect * right + up
    bottom_left = cam_pos + ahead * 2 - aspect * right - up
    u = x / width
    v = y / height
    p = top_left + u * (top_right - top_left) + v * (bottom_left - top_left)
    return np.asarray(cam_pos, float), normalize(p - cam_pos)


def intersect_all(o, d, tris, t_max=np.inf):
    """Brute-force closest hit. tris: (T, 3, 3). Returns (t, u, v, prim)."""
    best = (np.inf, 0.0, 0.0, -1)
    for i, tri in enumerate(tris):
        v0 = tri[0]
        e1 = tri[1] - v0
        e2 = tri[2] - v0
        p = np.cross(d, e2)
        det = e1 @ p
        if abs(det) < 1e-12:
            continue
        inv = 1.0 / det
        tv = o - v0
        u = (tv @ p) * inv
        if u < 0 or u > 1:
            continue
        q = np.cross(tv, e1)
        v = (d @ q) * inv
        if v < 0 or u + v > 1:
            continue
        t = (e2 @ q) * inv
        if 0 < t < min(best[0], t_max):
            best = (t, u, v, i)
    return best


def occluded(o, d, tris, t_max):
    t, _, _, prim = intersect_all(o, d, tris)
    return prim >= 0 and t < t_max


def eval_combined_brdf(n, l, v, base, metal, rough):
    """GGX + height-correlated Lagarde G2 (pre-divided) + Schlick + Lambert."""
    h = normalize(l + v)
    ndotl_raw = n @ l
    ndotv_raw = n @ v
    if ndotl_raw <= 0 or ndotv_raw <= 0:
        return np.zeros(3)
    ndotl = min(max(1e-5, ndotl_raw), 1.0)
    ndotv = min(max(1e-5, ndotv_raw), 1.0)
    ldoth = np.clip(l @ h, 0, 1)
    ndoth = np.clip(n @ h, 0, 1)
    f0 = MIN_F0 + (np.asarray(base) - MIN_F0) * metal
    f90 = min(1.0, (f0 @ LUM) / MIN_F0)
    fr = f0 + (f90 - f0) * (1 - ldoth) ** 5
    alpha = rough * rough
    a2 = alpha * alpha
    d_term = a2 / (np.pi * ((a2 - 1) * ndoth * ndoth + 1) ** 2)
    g2 = 0.5 / (ndotv * np.sqrt(a2 + ndotl * (ndotl - a2 * ndotl))
                + ndotl * np.sqrt(a2 + ndotv * (ndotv - a2 * ndotv)))
    specular = fr * (g2 * d_term * ndotl)
    diffuse = np.asarray(base) * (1 - metal) * (ndotl / np.pi)
    return (1.0 - fr) * diffuse + specular


def render_directional(cam_pos, cam_target, width, height, tris, corner_normals,
                       base, metal, rough, dir_pos, dir_color, emissive=(0, 0, 0),
                       gamma=True):
    """One-vertex render with non-stochastic directional NEE (the
    deterministic reference config). ``base``/``metal``/``rough`` may be
    per-prim arrays or scalars. Returns (H, W, 3)."""
    img = np.zeros((height, width, 3))
    tris = np.asarray(tris, float)
    dir_pos = np.asarray(dir_pos, float)
    dir_color = np.asarray(dir_color, float)
    for y in range(height):
        for x in range(width):
            o, d = primary_ray(cam_pos, cam_target, width, height, x, y)
            t, u, v, prim = intersect_all(o, d, tris)
            if prim < 0:
                continue
            point = o + d * t
            w = 1 - u - v
            n = normalize(w * corner_normals[3 * prim]
                          + u * corner_normals[3 * prim + 1]
                          + v * corner_normals[3 * prim + 2])
            bc = base[prim] if np.ndim(base) > 1 else np.asarray(base, float)
            mt = metal[prim] if np.ndim(metal) > 0 else metal
            rg = rough[prim] if np.ndim(rough) > 0 else rough

            result = np.asarray(emissive, float).copy()
            lvec = dir_pos - point
            dist = np.linalg.norm(lvec)
            l = lvec / dist
            cosa = max(0.0, n @ l)
            if not occluded(point + l * EPSILON, l, tris, dist - EPSILON):
                contrib = dir_color * cosa
                result = result + eval_combined_brdf(n, l, -d, bc, mt, rg) * contrib
            if gamma:
                result = np.sqrt(np.maximum(result, 0))
            img[y, x] = result
    return img
