"""glTF/GLB loader tests against the reference's shipped assets."""

import os

import numpy as np
import pytest

from physically_based_ray_tracer_tpu.models.gltf import load_gltf

HELMET = "/root/reference/assets/prefabs/models/SciFiHelmet/SciFiHelmet.gltf"
SPACESHIP_GLB = "/root/reference/Core/assets/prefabs/models/Spaceship/Spaceship.glb"
PINBALL_DIR = "/root/reference/Core/assets/prefabs/models/PinballMachine/Meshes"


@pytest.mark.skipif(not os.path.exists(HELMET), reason="reference assets absent")
def test_load_scifihelmet_gltf():
    mdl = load_gltf(HELMET)
    assert mdl.n_tris > 1000
    assert mdl.corners.shape == (mdl.n_tris * 3, 3)
    assert mdl.normals.shape == mdl.corners.shape
    assert mdl.uvs.shape == (mdl.n_tris * 3, 2)
    assert mdl.face_normals.shape == (mdl.n_tris, 3)
    n = np.linalg.norm(mdl.normals, axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-2)
    assert np.isfinite(mdl.corners).all()
    # uv flip applied; uvs within a sane range
    assert mdl.uvs.min() > -2 and mdl.uvs.max() < 3


@pytest.mark.skipif(not os.path.exists(SPACESHIP_GLB), reason="reference assets absent")
def test_load_glb_binary():
    mdl = load_gltf(SPACESHIP_GLB)
    assert mdl.n_tris > 10
    assert np.isfinite(mdl.corners).all()


@pytest.mark.skipif(not os.path.isdir(PINBALL_DIR), reason="reference assets absent")
def test_load_all_pinball_meshes():
    ok = 0
    for f in sorted(os.listdir(PINBALL_DIR)):
        if f.endswith(".glb"):
            mdl = load_gltf(os.path.join(PINBALL_DIR, f))
            assert mdl.n_tris > 0, f
            ok += 1
    assert ok >= 10


@pytest.mark.skipif(not os.path.exists(HELMET), reason="reference assets absent")
def test_helmet_renders():
    """Minimal scene3-style smoke: the helmet under a directional light."""
    import jax
    from physically_based_ray_tracer_tpu.render.renderer import Renderer
    from physically_based_ray_tracer_tpu.scene.camera import Camera
    from physically_based_ray_tracer_tpu.scene.lights import LightSet
    from physically_based_ray_tracer_tpu.scene.scene import Instance, build_scene
    from tests.scenes import TINY

    mdl = load_gltf(HELMET)
    lights = LightSet.make(dir_pos=[[3, 4, 5]], dir_color=[[3, 3, 3]])
    scene, depth = build_scene([mdl], [Instance(0)], lights)
    cam = Camera.make(pos=(0, 0, 3), target=(0, 0, 0))
    img = Renderer(scene, cam, TINY.replace(max_stack_depth=40,
                                            stochastic_lights=False)).tick()
    assert np.isfinite(img).all()
    assert img.max() > 0.01
