"""bf16 small-tile megakernel (ops/pallas_bf16.py) — correctness anchored
on BRUTE-FORCE f32 intersection, not on the f32 kernel (on degenerate
axis-aligned scenes the two kernels legitimately disagree on exactly-on-edge
tie-breaks; brute force is the arbiter).

Documented precision contract (see the module docstring):
  * hit records of agreeing rays are EXACT f32 (decode + group retest);
  * selection can swap to an edge-adjacent triangle within the bf16 noise
    band — hit-point displacement stays sub-1% of scene scale;
  * a small rate of lost/extra hits at silhouettes (<0.5%);
  * occlusion: no missed occlusions on interior rays; rare false
    occlusions within the silhouette apron.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physically_based_ray_tracer_tpu.bvh.dense import build_dense, build_dense_tlas
from physically_based_ray_tracer_tpu.ops.pallas_bf16 import (
    intersect_any_bf16, intersect_closest_bf16)
from physically_based_ray_tracer_tpu.scene.procedural import make_quad, make_sphere


def brute_closest(tri, o, d):
    v0 = tri[:, 0]
    e1 = tri[:, 1] - v0
    e2 = tri[:, 2] - v0
    P = np.cross(d[:, None, :], e2[None])
    det = np.sum(e1[None] * P, -1)
    inv = 1.0 / np.where(np.abs(det) > 1e-9, det, 1.0)
    tv = o[:, None, :] - v0[None]
    u = np.sum(tv * P, -1) * inv
    q = np.cross(tv, e1[None])
    v = np.sum(d[:, None, :] * q, -1) * inv
    t = np.sum(e2[None] * q, -1) * inv
    ok = ((np.abs(det) > 1e-9) & (u >= 0) & (v >= 0) & (u + v <= 1)
          & (t > 0))
    tb = np.where(ok, t, np.inf)
    best_t = tb.min(1)
    prim = np.where(np.isinf(best_t), -1, tb.argmin(1))
    return prim, np.where(np.isinf(best_t), 1e30, best_t)


def _rays(B, center=(0, 0, 3.0), spread=0.1, seed=1):
    rng = np.random.RandomState(seed)
    o = rng.randn(B, 3).astype(np.float32) * 0.2 + np.asarray(center,
                                                              np.float32)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = d + rng.randn(B, 3).astype(np.float32) * spread
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


@pytest.fixture(scope="module")
def sphere_bvh():
    tri = make_sphere(radius=1.0, lat=16, lon=24)[0].reshape(-1, 3, 3)
    db, depth = build_dense(tri, leaf_target=16, shape=True)
    return tri, db


def test_closest_matches_brute_force(sphere_bvh):
    tri, db = sphere_bvh
    o, d = _rays(2048)
    pb, tb = brute_closest(tri, o, d)
    h = intersect_closest_bf16(db, jnp.asarray(o), jnp.asarray(d),
                               interpret=True)
    p16 = np.asarray(h.prim)
    t16 = np.asarray(h.t)
    # found/miss agreement: <0.5% silhouette-class deviations
    assert np.mean((p16 >= 0) != (pb >= 0)) < 0.005
    both = (p16 >= 0) & (pb >= 0)
    same = both & (p16 == pb)
    assert same.sum() / max(both.sum(), 1) > 0.97
    # where the prim agrees, the refined record is exact f32
    np.testing.assert_allclose(t16[same], tb[same], rtol=2e-6, atol=2e-6)
    # where it differs, the hit POINT is an edge-adjacent swap (sub-1%)
    diff = both & (p16 != pb)
    if diff.any():
        P1 = o[diff] + tb[diff, None] * d[diff]
        P2 = o[diff] + t16[diff, None] * d[diff]
        assert np.linalg.norm(P1 - P2, axis=-1).max() < 0.02


def test_exact_uv_of_selected_prim(sphere_bvh):
    tri, db = sphere_bvh
    o, d = _rays(512, seed=7)
    h = intersect_closest_bf16(db, jnp.asarray(o), jnp.asarray(d),
                               interpret=True)
    p = np.asarray(h.prim)
    sel = p >= 0
    v0 = tri[np.maximum(p, 0), 0]
    e1 = tri[np.maximum(p, 0), 1] - v0
    e2 = tri[np.maximum(p, 0), 2] - v0
    # recompute u,v,t for the SELECTED triangle in f64: must match the Hit
    P = np.cross(d.astype(np.float64), e2)
    det = np.sum(e1 * P, -1)
    inv = 1.0 / np.where(np.abs(det) > 1e-12, det, 1.0)
    tv = o - v0
    u = np.sum(tv * P, -1) * inv
    q = np.cross(tv, e1)
    v = np.sum(d * q, -1) * inv
    t = np.sum(e2 * q, -1) * inv
    # interior winners are EXACT; apron winners keep a clamped record
    # displaced by at most the apron width (see pallas_bf16.REFINE_WIN)
    min_uv = np.minimum(np.minimum(u, v), 1.0 - u - v)
    interior = sel & (min_uv >= 1e-4)
    np.testing.assert_allclose(np.asarray(h.u)[interior], u[interior],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(h.v)[interior], v[interior],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(h.t)[sel], t[sel], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h.u)[sel], np.clip(u, 0, 1)[sel],
                               atol=0.025)


def test_occlusion_vs_brute(sphere_bvh):
    tri, db = sphere_bvh
    o, d = _rays(2048, seed=3)
    pb, tb = brute_closest(tri, o, d)
    tmax = np.full(2048, 2.5, np.float32)
    occ_true = (pb >= 0) & (tb < tmax)
    occ = np.asarray(intersect_any_bf16(db, jnp.asarray(o), jnp.asarray(d),
                                        jnp.asarray(tmax), interpret=True))
    # no missed occlusions beyond the silhouette class; few false ones
    assert np.mean(occ != occ_true) < 0.005
    # dead rays (tmax<=0) never occlude
    occ0 = np.asarray(intersect_any_bf16(
        db, jnp.asarray(o), jnp.asarray(d),
        jnp.zeros(2048, np.float32), interpret=True))
    assert not occ0.any()


def test_two_level_instances():
    """Shared-BLAS TLAS path: two instanced spheres + a floor quad."""
    sph = make_sphere(radius=1.0, lat=12, lon=16)[0].reshape(-1, 3, 3)
    quad = make_quad([-5, -1, -5], [5, -1, -5], [5, -1, 5], [-5, -1, 5]
                     )[0].reshape(-1, 3, 3)
    import numpy as np
    T = [np.eye(4, dtype=np.float32) for _ in range(3)]
    T[0][:3, 3] = [-1.5, 0, 0]
    T[1][:3, 3] = [1.5, 0, 0]
    db, meta, depth = build_dense_tlas([sph, quad], [0, 0, 1], T,
                                       leaf_target=16, shape=True)
    # world triangles for brute force (instance order = prim_base order)
    w = []
    for i, m in enumerate([0, 0, 1]):
        tri = [sph, quad][m]
        w.append(tri @ T[i][:3, :3].T + T[i][:3, 3])
    world = np.concatenate(w)
    o, d = _rays(1024, center=(0, 0.5, 4.0), spread=0.25, seed=5)
    pb, tb = brute_closest(world, o, d)
    h = intersect_closest_bf16(db, jnp.asarray(o), jnp.asarray(d),
                               interpret=True)
    p16, t16 = np.asarray(h.prim), np.asarray(h.t)
    assert np.mean((p16 >= 0) != (pb >= 0)) < 0.01
    both = (p16 >= 0) & (pb >= 0)
    same = both & (p16 == pb)
    assert same.sum() / max(both.sum(), 1) > 0.97
    np.testing.assert_allclose(t16[same], tb[same], rtol=2e-5, atol=2e-5)
    # instance ids: prim ranges identify the instance
    counts = [len(sph), len(sph), len(quad)]
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    inst_true = np.searchsorted(starts, np.maximum(pb, 0), side="right") - 1
    i16 = np.asarray(h.inst)
    assert (i16[same] == inst_true[same]).mean() > 0.999


def test_integrator_dispatch_bf16():
    """leaf_precision='bf16' renders the sphere demo close to f32."""
    from physically_based_ray_tracer_tpu.config import RenderConfig
    from physically_based_ray_tracer_tpu.render.renderer import Renderer
    from physically_based_ray_tracer_tpu.scene.presets import sphere_demo

    scene, cam = sphere_demo()
    base = dict(width=48, height=48, bounces=2, antialias=False,
                skybox=False, max_stack_depth=24)
    a = Renderer(scene, cam, RenderConfig(**base)).tick()
    b = Renderer(scene, cam,
                 RenderConfig(**base, leaf_precision="bf16")).tick()
    assert b.mean() > 0.01
    # interior shading identical; deviations confined to edge pixels
    d = np.abs(a - b).max(axis=-1)
    assert np.mean((a - b) ** 2) < 2e-3
    assert (d > 0.05).mean() < 0.03


def test_occlusion_edge_graze_confirmed():
    """Regression for the any-hit apron false-occlusion (r5): shadow rays
    passing just OUTSIDE a surface edge (inside the 0.02 bf16 accept
    apron) must stay VISIBLE — the kernel records them as uncertain
    candidates and the wrapper's exact f32 retest rejects the phantom.
    Rays just INSIDE stay occluded, and rays crossing the quad's internal
    diagonal (apron-uncertain on BOTH triangles) resolve to occluded via
    the conservative overflow. Pre-fix, every just-outside ray within the
    apron reported occluded (black center pixel in test_integrator)."""
    quad = make_quad([-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0])
    tri = quad[0].reshape(-1, 3, 3)
    db, _ = build_dense(tri, leaf_target=16, shape=True)

    B = 1024
    rng = np.random.RandomState(7)
    # aim points: along the quad's outer edges (excluding corners), offset
    # outward / inward by ~0.01 world units (~0.005 barycentric: well
    # inside the 0.02 apron), plus points crossing the internal diagonal
    s = rng.uniform(-0.8, 0.8, B).astype(np.float32)
    side = rng.randint(0, 4, B)
    edge_pt = np.stack([np.where(side == 0, s, np.where(side == 1, 1.0,
                        np.where(side == 2, s, -1.0))),
                        np.where(side == 0, -1.0, np.where(side == 1, s,
                        np.where(side == 2, 1.0, s)))], axis=1)
    outward = np.stack([np.where(side == 0, 0.0, np.where(side == 1, 1.0,
                        np.where(side == 2, 0.0, -1.0))),
                        np.where(side == 0, -1.0, np.where(side == 1, 0.0,
                        np.where(side == 2, 1.0, 0.0)))], axis=1)
    kind = rng.randint(0, 3, B)          # 0=outside, 1=inside, 2=diagonal
    eps = 0.01
    aim = np.where((kind == 0)[:, None], edge_pt + outward * eps,
                   np.where((kind == 1)[:, None], edge_pt - outward * eps,
                            np.stack([s, -s], axis=1)))
    # the quad's internal diagonal is p0-p2 (the line x=y); kind==2 aims
    # at crossing points within eps of it
    aim = np.where((kind == 2)[:, None],
                   np.stack([s, s + rng.uniform(-eps, eps, B).astype(
                       np.float32)], axis=1), aim)
    o = np.concatenate([aim, np.full((B, 1), 3.0, np.float32)],
                       axis=1).astype(np.float32)
    d = np.tile(np.asarray([[0.0, 0.0, -1.0]], np.float32), (B, 1))
    tmax = np.full(B, 6.0, np.float32)

    occ = np.asarray(intersect_any_bf16(db, jnp.asarray(o), jnp.asarray(d),
                                        jnp.asarray(tmax), interpret=True))
    outside = kind == 0
    inside = kind == 1
    diag = kind == 2
    # visible grazes must stay visible (the fixed path); tiny budget for
    # conservative overflow near vertices of the two triangles
    assert occ[outside].mean() < 0.02, \
        f"false occlusion on outside grazes: {occ[outside].mean():.1%}"
    assert occ[inside].all(), "inside grazes must occlude"
    assert occ[diag].all(), "internal-edge crossings must occlude"
