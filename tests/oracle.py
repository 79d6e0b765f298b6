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


# ---------------------------------------------------------------------------
# Stochastic oracle (round 5): the FULL Trace semantics in scalar float64 —
# stochastic light-type lottery, point/spot/dir NEE with the reference's
# falloff and tmax quirks, dielectric Fresnel RR, mirror fast path, and the
# diffuse/specular lobe RIS with VNDF-Heitz GGX sampling (default BRDFConfig,
# Core/BRDF.h:42-160). Consumes the SAME Purpose-stream uniforms as the
# integrator (the test computes them once with utils.rng and passes float64
# copies), so per-pixel radiance must agree with trace_paths allclose.
# Reference semantics: Core/Renderer.cpp:150-406.
# ---------------------------------------------------------------------------

P_POINT_W, P_DIR_W, P_SPOT_W, P_AREA_W = 0.3, 0.5, 0.2, 0.3


def _rotation_to_z(v):
    q = np.array([v[1], -v[0], 0.0, 1.0 + v[2]])
    if v[2] < -0.99999:
        return np.array([1.0, 0.0, 0.0, 0.0])
    return q / np.linalg.norm(q)


def _quat_rot(q, v):
    axis, w = q[:3], q[3]
    return (2.0 * (axis @ v) * axis + (w * w - axis @ axis) * v
            + 2.0 * w * np.cross(axis, v))


def _quat_inv(q):
    return q * np.array([-1.0, -1.0, -1.0, 1.0])


def _lum(rgb):
    return float(np.asarray(rgb) @ LUM)


def _f90(f0):
    return min(1.0, _lum(f0) / MIN_F0)


def _fresnel(f0, f90, x):
    return f0 + (f90 - f0) * (1.0 - x) ** 5


def _smith_g1(a2, ndots2):
    return 2.0 / (np.sqrt((a2 * (1.0 - ndots2) + ndots2)
                          / max(ndots2, 1e-30)) + 1.0)


def _cosine_hemisphere(u):
    a = np.sqrt(max(u[0], 1e-12))
    b = 2.0 * np.pi * u[1]
    return np.array([a * np.cos(b), a * np.sin(b),
                     np.sqrt(max(1.0 - u[0], 1e-12))])


def _vndf_heitz(ve, alpha, u):
    """Heitz 2018 visible-NDF GGX half-vector (Core/BRDF.cpp:244-268)."""
    vh = np.array([alpha * ve[0], alpha * ve[1], ve[2]])
    vh /= np.linalg.norm(vh)
    lensq = vh[0] ** 2 + vh[1] ** 2
    if lensq > 0.0:
        inv = 1.0 / np.sqrt(max(lensq, 1e-30))
        t1 = np.array([-vh[1] * inv, vh[0] * inv, 0.0])
    else:
        t1 = np.array([1.0, 0.0, 0.0])
    t2 = np.cross(vh, t1)
    r = np.sqrt(max(u[0], 1e-12))
    phi = 2.0 * np.pi * u[1]
    p1 = r * np.cos(phi)
    p2 = r * np.sin(phi)
    s = 0.5 * (1.0 + vh[2])
    p2 = (1.0 - s) * np.sqrt(max(1.0 - p1 * p1, 1e-12)) + s * p2
    nh = (p1 * t1 + p2 * t2
          + np.sqrt(max(1e-12, 1.0 - p1 * p1 - p2 * p2)) * vh)
    h = np.array([alpha * nh[0], alpha * nh[1], max(0.0, nh[2])])
    return h / np.linalg.norm(h)


def get_brdf_probability(base, metal, n, v):
    """Specular lobe pick probability (Core/BRDF.cpp:504-526)."""
    f0 = _lum(MIN_F0 + (np.asarray(base) - MIN_F0) * metal)
    diff = _lum(np.asarray(base) * (1.0 - metal))
    x = max(0.0, float(n @ v))
    f0_rgb = np.array([f0, f0, f0])
    fres = min(max(_lum(_fresnel(f0_rgb, _f90(f0_rgb), x)), 0.0), 1.0)
    spec = fres * 0.5
    dif = diff * (1.0 - fres * 0.5) * 1.5
    return min(max(spec / max(1e-4, spec + dif), 0.05), 0.7)


def sample_indirect(u2, shad_n, v, base, metal, rough, pick_spec):
    """eval_indirect_combined_brdf in float64 (Core/BRDF.cpp:454-502,
    default config: VNDF-Heitz GGX + height-correlated G2/G1 weight +
    Lambert diffuse tinted by the Fresnel complement)."""
    base = np.asarray(base, float)
    q = _rotation_to_z(shad_n)
    v_local = _quat_rot(q, v)
    alpha = rough * rough
    a2 = alpha * alpha
    f0 = MIN_F0 + (base - MIN_F0) * metal
    f90 = _f90(f0)
    h = _vndf_heitz(v_local, alpha, u2)
    if pick_spec:
        if alpha == 0.0:
            h = np.array([0.0, 0.0, 1.0])
        l = 2.0 * (v_local @ h) * h - v_local
        hdotl = min(max(h @ l, 1e-5), 1.0)
        ndotl = min(max(l[2], 1e-5), 1.0)
        ndotv = min(max(v_local[2], 1e-5), 1.0)
        f = _fresnel(f0, f90, hdotl)
        g1v = _smith_g1(a2, ndotv * ndotv)
        g1l = _smith_g1(a2, ndotl * ndotl)
        weight = f * (g1l / (g1v + g1l - g1v * g1l))
        l_local = l
    else:
        l_local = _cosine_hemisphere(u2)
        vdoth = min(max(v_local @ h, 1e-5), 1.0)
        weight = (base * (1.0 - metal)
                  * (1.0 - _fresnel(f0, f90, vdoth)))
    valid = _lum(weight) != 0.0
    d = _quat_rot(_quat_inv(q), l_local)
    return d / np.linalg.norm(d), weight, valid


def refract_ref(d, n, eta):
    """Renderer::refract semantics (Core/Renderer.cpp:522-550)."""
    cosi = min(max(d @ n, -1.0), 1.0)
    eta_ratio = (1.0 / eta) if cosi <= 0.0 else eta
    cos_theta = abs(cosi)
    k = 1.0 - eta_ratio * eta_ratio * (1.0 - cos_theta * cos_theta)
    if k <= 0.0:
        return np.zeros(3)
    return eta_ratio * (d - n * cos_theta) - n * np.sqrt(k)


def trace_path_stochastic(o, d, scene, draws, bounces,
                          exact_point_falloff=False, exact_shadow_tmax=False):
    """Scalar float64 path trace with the reference's stochastic estimator.

    ``scene``: dict with tris (T,3,3), corner_normals (3T,3), per-prim
    base/metal/rough/emissive/transmissive arrays, and light arrays
    (point_pos/point_color (NP,*), dir_pos/dir_color, spot_pos/spot_color/
    spot_rot — any may be empty).
    ``draws``: per-bounce dict of float64 uniforms with keys
    u_type, u_sel, u_lobe, u_diel, u2 (2,) — the integrator's Purpose
    streams for this pixel. Returns radiance (3,)."""
    tris = scene["tris"]
    cn = scene["corner_normals"]
    np_l = len(scene.get("point_pos", []))
    nd_l = len(scene.get("dir_pos", []))
    ns_l = len(scene.get("spot_pos", []))
    w = [P_POINT_W * (np_l > 0), P_DIR_W * (nd_l > 0), P_SPOT_W * (ns_l > 0),
         0.0]
    total_w = sum(w)
    p_point, p_dir, p_spot, _ = [x / total_w if total_w else 0.0 for x in w]

    radiance = np.zeros(3)
    throughput = np.ones(3)
    o = np.asarray(o, float)
    d = np.asarray(d, float)
    for depth in range(bounces):
        t, u, v, prim = intersect_all(o, d, tris)
        if prim < 0:
            break
        point = o + d * t
        wbar = 1.0 - u - v
        n = normalize(wbar * cn[3 * prim] + u * cn[3 * prim + 1]
                      + v * cn[3 * prim + 2])
        view = -d
        base = np.asarray(scene["base"][prim], float)
        metal = float(scene["metal"][prim])
        rough = float(scene["rough"][prim])
        emissive = np.asarray(scene["emissive"][prim], float)
        transmissive = float(scene["transmissive"][prim])
        dr = draws[depth]

        # ---- stochastic NEE (Core/Renderer.cpp:198-326) -------------------
        u_pick = dr["u_type"]
        pick_point = u_pick < p_point
        pick_dir = (not pick_point) and (u_pick < p_point + p_dir)
        pick_spot = (not pick_point) and (not pick_dir) \
            and (u_pick < p_point + p_dir + p_spot)
        direct = np.zeros(3)
        l_dir, t_other, contrib = None, 0.0, np.zeros(3)
        if pick_point and np_l:
            # one_shadow_ray estimator: ONE light uniformly, weight by NP
            which = min(int(dr["u_sel"] * np_l), np_l - 1)
            lvec = np.asarray(scene["point_pos"][which], float) - point
            dist_sq = max(lvec @ lvec, 1e-20)
            dist = np.sqrt(dist_sq)
            ld = lvec / dist
            cosa = max(n @ ld, 0.0)
            falloff = 1.0 / dist_sq if exact_point_falloff else 1.0 / dist
            c = (np.asarray(scene["point_color"][which], float)
                 * falloff * cosa) * np_l
            src = dist if exact_shadow_tmax else dist_sq
            l_dir, t_other, contrib = ld, src - EPSILON, c / p_point
        elif pick_dir and nd_l:
            lvec = np.asarray(scene["dir_pos"][0], float) - point
            dist = np.sqrt(max(lvec @ lvec, 1e-20))
            ld = lvec / dist
            cosa = max(0.0, n @ ld)
            c = np.asarray(scene["dir_color"][0], float) * cosa / p_dir
            l_dir, t_other, contrib = ld, dist - EPSILON, c
        elif pick_spot and ns_l:
            lvec = np.asarray(scene["spot_pos"][0], float) - point
            dist = np.sqrt(max(lvec @ lvec, 1e-20))
            ld = lvec / dist
            cosa = max(0.0, n @ ld)
            factor = ld @ np.asarray(scene["spot_rot"][0], float)
            c = (np.asarray(scene["spot_color"][0], float)
                 * (cosa / (dist * dist)) * (1.0 if factor > 0.9 else 0.0)
                 ) / p_spot
            l_dir, t_other, contrib = ld, dist - EPSILON, c
        if l_dir is not None and t_other > 0.0:
            if not occluded(point + l_dir * EPSILON, l_dir, tris, t_other):
                bsdf = eval_combined_brdf(n, l_dir, view, base, metal, rough)
                direct = bsdf * contrib

        vertex_rad = throughput * emissive + throughput * direct
        last = depth == bounces - 1
        is_dielectric = (transmissive == 1.0) and not last
        if not is_dielectric:
            radiance = radiance + vertex_rad

        # ---- continuation -------------------------------------------------
        if is_dielectric:
            n1, n2 = 1.0, 1.46
            cos_theta = min(max(-(d @ n), 0.0), 1.0)
            eta = n1 / n2
            k = 1.0 - eta * eta * (1.0 - cos_theta * cos_theta)
            r0 = ((n1 - n2) / (n1 + n2)) ** 2
            fresnel = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
            if k <= 0.0:
                fresnel = 1.0
            if dr["u_diel"] < fresnel:
                o = point + n * EPSILON
                d = d - 2.0 * (d @ n) * n
            else:
                o = point - n * EPSILON
                d = refract_ref(d, n, eta)
            continue
        is_mirror = (metal == 1.0) and (rough == 0.0)
        p_spec = get_brdf_probability(base, metal, n, view)
        pick_spec = (dr["u_lobe"] < p_spec) or is_mirror
        lobe_div = 1.0 if is_mirror else (p_spec if pick_spec else 1.0 - p_spec)
        bdir, weight, valid = sample_indirect(dr["u2"], n, view, base, metal,
                                              rough, pick_spec)
        if not valid:
            break
        throughput = throughput * weight / lobe_div
        o = point + bdir * EPSILON
        d = bdir
    return radiance
