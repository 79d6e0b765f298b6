"""End-to-end integrator behaviour on tiny scenes."""

import jax
import numpy as np
import pytest

from physically_based_ray_tracer_tpu.config import RenderConfig, RenderMode
from physically_based_ray_tracer_tpu.render.renderer import Renderer
from physically_based_ray_tracer_tpu.scene.lights import LightSet
from physically_based_ray_tracer_tpu.scene.procedural import make_quad, make_sphere
from physically_based_ray_tracer_tpu.scene.scene import Instance, MeshModel, build_scene

from tests.scenes import TINY, sphere_scene


@pytest.fixture(scope="module")
def scene_cam():
    return sphere_scene()


def test_render_finite_and_lit(scene_cam):
    scene, cam = scene_cam
    r = Renderer(scene, cam, TINY)
    img = r.tick()
    assert np.isfinite(img).all()
    assert img.max() > 0.05          # something is lit
    assert img.min() >= 0.0
    # sphere is reddish: center pixel has R > B
    c = img[16, 16]
    assert c[0] > c[2]


def test_determinism_same_seed(scene_cam):
    scene, cam = scene_cam
    img1 = Renderer(scene, cam, TINY).tick(jax.random.key(7))
    img2 = Renderer(scene, cam, TINY).tick(jax.random.key(7))
    np.testing.assert_array_equal(img1, img2)


def test_different_seed_differs(scene_cam):
    scene, cam = scene_cam
    img1 = Renderer(scene, cam, TINY).tick(jax.random.key(1))
    img2 = Renderer(scene, cam, TINY).tick(jax.random.key(2))
    assert not np.array_equal(img1, img2)


def test_accumulation_reduces_noise(scene_cam):
    scene, cam = scene_cam
    r = Renderer(scene, cam, TINY)
    imgs = [r.tick(jax.random.key(s)) for s in range(6)]
    assert float(np.asarray(r.film.spp).max()) == 6.0
    # accumulated frames converge: successive display images change less
    d_early = np.abs(imgs[1] - imgs[0]).mean()
    d_late = np.abs(imgs[5] - imgs[4]).mean()
    assert d_late < d_early


def test_aov_basecolor(scene_cam):
    scene, cam = scene_cam
    r = Renderer(scene, cam, TINY.replace(rendering_mode=RenderMode.BASECOLOR,
                                          gamma_corrected=False))
    img = r.tick()
    # center of screen = sphere with base color (.8, .3, .2)
    np.testing.assert_allclose(img[16, 16], [0.8, 0.3, 0.2], atol=0.02)
    # background = black
    np.testing.assert_allclose(img[0, 0], 0.0, atol=1e-6)


def test_aov_shadingnormal(scene_cam):
    scene, cam = scene_cam
    r = Renderer(scene, cam, TINY.replace(rendering_mode=RenderMode.SHADINGNORMAL,
                                          gamma_corrected=False))
    img = r.tick()
    n = img[16, 16] * 2.0 - 1.0
    assert np.linalg.norm(n) == pytest.approx(1.0, abs=0.05)
    # sphere front face points toward camera (+z-ish)
    assert n[2] > 0.5


def test_emissive_surface_glows():
    # emissive kept <= 1: the display path clamps to [0,1] like the
    # reference's RGBF32_to_RGB8
    glow = MeshModel.from_fat(make_sphere(radius=1.0, lat=12, lon=16),
                              base_color=(0.1, 0.1, 0.1), emissive=(0.9, 0.55, 0.3))
    scene, _ = build_scene([glow], [Instance(0)], LightSet.make())
    from physically_based_ray_tracer_tpu.scene.camera import Camera
    cam = Camera.make(pos=(0, 0, 4), target=(0, 0, 0))
    # bounces=1: deeper vertices would add the emissive again (as the
    # reference's recursion does when the bounce ray re-hits the sphere)
    img = Renderer(scene, cam, TINY.replace(gamma_corrected=False, bounces=1)).tick()
    np.testing.assert_allclose(img[16, 16], [0.9, 0.55, 0.3], atol=0.01)


def test_constant_skybox_on_miss(scene_cam):
    scene, cam = scene_cam
    sky = np.full((4, 8, 3), [0.2, 0.4, 0.9], np.float32)
    scene2 = scene._replace(sky=jax.numpy.asarray(sky))
    img = Renderer(scene2, cam, TINY.replace(skybox=True, gamma_corrected=False)).tick()
    np.testing.assert_allclose(img[0, 0], [0.2, 0.4, 0.9], atol=1e-4)


def test_shadow_occlusion():
    """A plate between light and floor must darken the floor beneath it."""
    plate = MeshModel.from_fat(
        make_quad([-1, 1.5, -1], [1, 1.5, -1], [1, 1.5, 1], [-1, 1.5, 1]),
        base_color=(0.7, 0.7, 0.7))
    floor = MeshModel.from_fat(
        make_quad([-6, 0, -6], [6, 0, -6], [6, 0, 6], [-6, 0, 6]),
        base_color=(0.7, 0.7, 0.7), roughness=0.9)
    lights = LightSet.make(point_pos=[[0, 3, 0]], point_color=[[30, 30, 30]]).pad_points(4)
    scene, _ = build_scene([plate, floor], [Instance(0), Instance(1)], lights)
    from physically_based_ray_tracer_tpu.scene.camera import Camera
    cam = Camera.make(pos=(0, 4.0, 4.5), target=(0, 0, 0))
    cfg = TINY.replace(bounces=1, stochastic_lights=False)
    # force point-only lottery by removing other types and using stochastic
    cfg = TINY.replace(bounces=1)
    img = Renderer(scene, cam, cfg).tick()
    assert np.isfinite(img).all()
    # center (under plate, in shadow) darker than off-axis floor
    center = img[18, 16].mean()
    edge = img[28, 4].mean()
    assert center <= edge + 1e-6


def test_mirror_sees_sky():
    mirror = MeshModel.from_fat(make_sphere(radius=1.0, lat=12, lon=16),
                                base_color=(1.0, 1.0, 1.0), metalness=1.0,
                                roughness=0.0)
    scene, _ = build_scene([mirror], [Instance(0)], LightSet.make(
        dir_pos=[[3, 5, 2]], dir_color=[[0, 0, 0]]))
    sky = np.full((4, 8, 3), [1.0, 0.5, 0.25], np.float32)
    scene = scene._replace(sky=jax.numpy.asarray(sky))
    from physically_based_ray_tracer_tpu.scene.camera import Camera
    cam = Camera.make(pos=(0, 0, 4), target=(0, 0, 0))
    img = Renderer(scene, cam, TINY.replace(skybox=True, gamma_corrected=False)).tick()
    # mirror center reflects sky color scaled by Fresnel (metal F0 = white)
    c = img[16, 16]
    assert c[0] > 0.5 and c[0] > c[1] > c[2]


def test_nonstochastic_uses_directional_only(scene_cam):
    scene, cam = scene_cam
    img = Renderer(scene, cam, TINY.replace(stochastic_lights=False)).tick()
    assert np.isfinite(img).all() and img.max() > 0.0


def test_pixel_order_invariance(scene_cam):
    """Morton vs scanline pixel order must produce the same image (RNG is
    keyed by global pixel id; traversal tiling never changes ray results)."""
    scene, cam = scene_cam
    img_m = Renderer(scene, cam, TINY.replace(pixel_order="morton")).tick()
    img_s = Renderer(scene, cam, TINY.replace(pixel_order="scanline")).tick()
    np.testing.assert_allclose(img_m, img_s, atol=1e-6)


def test_traversal_mode_equivalence(scene_cam):
    """wave / packet / lane traversals must render the same image."""
    scene, cam = scene_cam
    imgs = {m: Renderer(scene, cam, TINY.replace(traversal=m)).tick()
            for m in ("wave", "packet", "lane")}
    np.testing.assert_allclose(imgs["wave"], imgs["packet"], atol=1e-5)
    np.testing.assert_allclose(imgs["wave"], imgs["lane"], atol=1e-5)


def test_samples_per_pixel_reduces_variance(scene_cam):
    """spp=4 in-frame averaging must cut noise vs spp=1 (same seed)."""
    scene, cam = scene_cam
    cfg1 = TINY.replace(gamma_corrected=False)
    cfg4 = TINY.replace(gamma_corrected=False, samples_per_pixel=4)
    img1a = Renderer(scene, cam, cfg1).tick(jax.random.key(0))
    img1b = Renderer(scene, cam, cfg1).tick(jax.random.key(99))
    img4a = Renderer(scene, cam, cfg4).tick(jax.random.key(0))
    img4b = Renderer(scene, cam, cfg4).tick(jax.random.key(99))
    noise1 = np.abs(img1a - img1b).mean()
    noise4 = np.abs(img4a - img4b).mean()
    assert noise4 < noise1
