"""Texture pipeline: texel fetch, channel conventions, normal mapping
(Scene::GetMaterialBRDF / GetShadingNormal parity, Core/Scene.cpp:60-218)."""

import jax.numpy as jnp
import numpy as np

from physically_based_ray_tracer_tpu.config import RenderConfig, RenderMode
from physically_based_ray_tracer_tpu.models.textures import constant_texture, pack_rgba_u32
from physically_based_ray_tracer_tpu.render.renderer import Renderer
from physically_based_ray_tracer_tpu.scene.camera import Camera
from physically_based_ray_tracer_tpu.scene.lights import LightSet
from physically_based_ray_tracer_tpu.scene.material import material_at_hit, shading_normal
from physically_based_ray_tracer_tpu.scene.procedural import make_quad
from physically_based_ray_tracer_tpu.scene.scene import Instance, MeshModel, build_scene

CFG = RenderConfig(width=24, height=24, bounces=1, antialias=False,
                   skybox=False, max_stack_depth=16, gamma_corrected=False)


def quad_scene(**model_kw):
    quad = MeshModel.from_fat(
        make_quad([-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]), **model_kw)
    scene, _ = build_scene([quad], [Instance(0)], LightSet.make())
    return scene


def test_albedo_texture_fetch_srgb():
    # 2x2 checker: left column red, right column green (sRGB values)
    tex = np.zeros((2, 2, 3), np.uint8)
    tex[:, 0] = [255, 0, 0]
    tex[:, 1] = [0, 255, 0]
    scene = quad_scene(albedo_texture=pack_rgba_u32(tex))
    # quad UVs: (0,0) at v0=(-1,-1) ... hit at u~0.25 (left half)
    prim = jnp.asarray([0])
    m = material_at_hit(scene, prim, jnp.asarray([0.1]), jnp.asarray([0.1]))
    np.testing.assert_allclose(np.asarray(m.base_color)[0], [1.0, 0.0, 0.0], atol=1e-5)


def test_rma_channel_convention():
    # RMA texel: G = roughness (128), B = metalness (255)
    tex = np.zeros((1, 1, 3), np.uint8)
    tex[0, 0] = [7, 128, 255]
    scene = quad_scene(rma_texture=pack_rgba_u32(tex))
    m = material_at_hit(scene, jnp.asarray([0]), jnp.asarray([0.3]), jnp.asarray([0.3]))
    assert np.isclose(float(m.roughness[0]), 128 / 255, atol=1e-5)
    assert np.isclose(float(m.metalness[0]), 1.0, atol=1e-5)


def test_emission_texture_is_raw_rgb():
    tex = np.zeros((1, 1, 3), np.uint8)
    tex[0, 0] = [51, 102, 204]
    scene = quad_scene(emission_texture=pack_rgba_u32(tex))
    m = material_at_hit(scene, jnp.asarray([0]), jnp.asarray([0.2]), jnp.asarray([0.2]))
    np.testing.assert_allclose(np.asarray(m.emissive)[0],
                               [51 / 255, 102 / 255, 204 / 255], atol=1e-5)


def test_constant_material_without_textures():
    scene = quad_scene(base_color=(0.2, 0.4, 0.6), metalness=0.3, roughness=0.7,
                       emissive=(0.1, 0.0, 0.0))
    m = material_at_hit(scene, jnp.asarray([0]), jnp.asarray([0.2]), jnp.asarray([0.2]))
    np.testing.assert_allclose(np.asarray(m.base_color)[0], [0.2, 0.4, 0.6], atol=1e-6)
    assert np.isclose(float(m.metalness[0]), 0.3)
    assert np.isclose(float(m.roughness[0]), 0.7)


def test_flat_normal_map_is_identity():
    # normal texel (128,128,255) ~ tangent-space (0,0,1) -> shading normal
    # unchanged (up to 1/255 quantization)
    flat = np.zeros((1, 1, 3), np.uint8)
    flat[0, 0] = [128, 128, 255]
    scene_nm = quad_scene(normal_texture=pack_rgba_u32(flat))
    scene_plain = quad_scene()
    prim = jnp.asarray([0])
    u = jnp.asarray([0.3])
    v = jnp.asarray([0.2])
    n_mapped = np.asarray(shading_normal(scene_nm, prim, u, v, True))[0]
    n_plain = np.asarray(shading_normal(scene_plain, prim, u, v, True))[0]
    assert np.dot(n_mapped, n_plain) > 0.999


def test_normal_map_tilts_normal():
    # strong +x tangent-space normal must tilt the shading normal along the
    # quad's tangent direction
    tilted = np.zeros((1, 1, 3), np.uint8)
    tilted[0, 0] = [255, 128, 128]
    scene = quad_scene(normal_texture=pack_rgba_u32(tilted))
    n = np.asarray(shading_normal(scene, jnp.asarray([0]), jnp.asarray([0.3]),
                                  jnp.asarray([0.3]), True))[0]
    base = np.asarray([0.0, 0.0, 1.0])
    assert abs(np.dot(n, base)) < 0.9  # clearly tilted away from geometric normal


def test_normal_mapped_flag_off_ignores_texture():
    tilted = np.zeros((1, 1, 3), np.uint8)
    tilted[0, 0] = [255, 128, 128]
    scene = quad_scene(normal_texture=pack_rgba_u32(tilted))
    n = np.asarray(shading_normal(scene, jnp.asarray([0]), jnp.asarray([0.3]),
                                  jnp.asarray([0.3]), False))[0]
    np.testing.assert_allclose(np.abs(n), [0, 0, 1], atol=1e-5)


def test_textured_render_aov():
    tex = np.zeros((2, 2, 3), np.uint8)
    tex[:, 0] = [255, 0, 0]
    tex[:, 1] = [0, 255, 0]
    quad = MeshModel.from_fat(
        make_quad([-4, -4, 0], [4, -4, 0], [4, 4, 0], [-4, 4, 0]),
        albedo_texture=pack_rgba_u32(tex))
    scene, _ = build_scene([quad], [Instance(0)], LightSet.make())
    cam = Camera.make(pos=(0, 0, 3), target=(0, 0, 0))
    img = Renderer(scene, cam, CFG.replace(rendering_mode=RenderMode.BASECOLOR)).tick()
    # both texture colors appear
    assert (img[:, :, 0] > 0.5).any() and (img[:, :, 1] > 0.5).any()
