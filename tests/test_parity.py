"""End-to-end parity: wavefront integrator vs the scalar numpy oracle.

The deterministic reference config (non-stochastic directional NEE, one path
vertex, no AA — the subset of Renderer::Trace with no RNG) must match the
oracle image allclose. This is the framework's analogue of BASELINE's
"images allclose to the C++ engine" criterion, runnable without the Windows
binary.
"""

import jax
import numpy as np
import pytest

from physically_based_ray_tracer_tpu.config import RenderConfig
from physically_based_ray_tracer_tpu.render.renderer import Renderer
from physically_based_ray_tracer_tpu.scene.camera import Camera
from physically_based_ray_tracer_tpu.scene.lights import LightSet
from physically_based_ray_tracer_tpu.scene.procedural import make_quad, make_sphere
from physically_based_ray_tracer_tpu.scene.scene import Instance, MeshModel, build_scene

from tests import oracle

W = H = 24
CFG = RenderConfig(width=W, height=H, bounces=1, antialias=False, skybox=False,
                   stochastic_lights=False, max_stack_depth=24)


@pytest.fixture(scope="module")
def setup():
    sphere = MeshModel.from_fat(make_sphere(radius=1.0, lat=10, lon=14),
                                base_color=(0.8, 0.3, 0.2), roughness=0.5,
                                metalness=0.2)
    floor = MeshModel.from_fat(  # wound so the normal points up (+y)
        make_quad([-5, -1.2, -5], [-5, -1.2, 5], [5, -1.2, 5], [5, -1.2, -5]),
        base_color=(0.5, 0.6, 0.7), roughness=0.9)
    lights = LightSet.make(dir_pos=[[4, 6, 3]], dir_color=[[2.0, 1.9, 1.7]])
    scene, _ = build_scene([sphere, floor], [Instance(0), Instance(1)], lights)
    cam_pos, cam_target = (0.0, 0.8, 3.5), (0.0, 0.0, 0.0)
    cam = Camera.make(pos=cam_pos, target=cam_target)

    # oracle inputs: world triangles + per-corner normals + per-prim materials
    tris = np.stack([np.asarray(scene.tri_v0),
                     np.asarray(scene.tri_v0) + np.asarray(scene.tri_e1),
                     np.asarray(scene.tri_v0) + np.asarray(scene.tri_e2)], axis=1)
    corner_n = np.asarray(scene.corner_normal)
    pm = np.asarray(scene.prim_model)
    base = np.asarray(scene.mat_base)[pm]
    metal = np.asarray(scene.mat_metal)[pm]
    rough = np.asarray(scene.mat_rough)[pm]
    ref = oracle.render_directional(
        np.asarray(cam_pos, float), np.asarray(cam_target, float), W, H,
        tris, corner_n, base, metal, rough,
        dir_pos=[4, 6, 3], dir_color=[2.0, 1.9, 1.7])
    # oracle HIT mask (independent of lighting) for the AOV comparison
    hitmask = np.zeros((H, W), bool)
    for y in range(H):
        for x in range(W):
            o, d = oracle.primary_ray(np.asarray(cam_pos, float),
                                      np.asarray(cam_target, float), W, H, x, y)
            hitmask[y, x] = oracle.intersect_all(o, d, tris)[3] >= 0
    return scene, cam, ref, hitmask


def test_image_allclose_to_oracle(setup):
    scene, cam, ref, _ = setup
    img = Renderer(scene, cam, CFG).tick(jax.random.key(0))
    # f32 vs f64, epsilon-offset shadow rays at silhouettes: allow a few
    # boundary pixels to differ, everything else tight
    diff = np.abs(img - ref)
    frac_loose = (diff.max(axis=-1) > 2e-3).mean()
    assert frac_loose < 0.02, f"{frac_loose:.3%} pixels off, max diff {diff.max():.4f}"
    assert np.median(diff) < 2e-4


def test_aov_depth_matches_oracle_hits(setup):
    scene, cam, ref, hitmask = setup
    from physically_based_ray_tracer_tpu.config import RenderMode
    img = Renderer(scene, cam, CFG.replace(rendering_mode=RenderMode.BASECOLOR,
                                           gamma_corrected=False)).tick()
    aov = img.sum(axis=-1) > 0
    agree = (hitmask == aov).mean()
    assert agree > 0.97, f"hit masks agree only {agree:.3%}"
