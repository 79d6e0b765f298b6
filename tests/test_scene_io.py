"""Reference-format JSON serialization + camera/light/gameobject parsing."""

import json
import math
import os

import numpy as np
import pytest

from physically_based_ray_tracer_tpu.scene.camera import Camera
from physically_based_ray_tracer_tpu.scene.scene import Instance
from physically_based_ray_tracer_tpu.scene.serialization import (
    load_camera_json, load_gameobject_json, load_scene_dir, save_camera_json,
    save_gameobject_json, save_light_json)

REF_ASSETS = "/root/reference/assets"


def test_camera_roundtrip(tmp_path):
    cam = Camera.make(pos=(1.5, -2.0, 3.25), target=(0.5, 0.25, -1.0))
    p = str(tmp_path / "camera.json")
    save_camera_json(p, cam)
    cam2 = load_camera_json(p)
    np.testing.assert_allclose(np.asarray(cam2.pos), np.asarray(cam.pos), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cam2.target), np.asarray(cam.target), rtol=1e-6)


def test_gameobject_roundtrip(tmp_path):
    inst = Instance(model=2, position=(1, 2, 3), rotation=(0.0, math.pi / 2, math.pi),
                    scale=(1, 1, 1))
    p = str(tmp_path / "obj.json")
    save_gameobject_json(p, inst)
    inst2 = load_gameobject_json(p)
    assert inst2.model == 2
    np.testing.assert_allclose(inst2.position, inst.position)
    np.testing.assert_allclose(inst2.rotation, inst.rotation, atol=1e-6)


def test_light_json_format(tmp_path):
    p = str(tmp_path / "light.json")
    save_light_json(p, (1, 2, 3), (4, 5, 6), (0, -1, 0))
    with open(p) as f:
        d = json.load(f)
    assert d == {"pX": 1.0, "pY": 2.0, "pZ": 3.0, "cX": 4.0, "cY": 5.0,
                 "cZ": 6.0, "rX": 0.0, "rY": -1.0, "rZ": 0.0}


@pytest.mark.skipif(not os.path.isdir(REF_ASSETS), reason="reference assets absent")
def test_load_reference_camera():
    cam = load_camera_json(os.path.join(REF_ASSETS, "prefabs/camera.json"))
    p = np.asarray(cam.pos)
    assert p.shape == (3,) and np.isfinite(p).all()


@pytest.mark.skipif(not os.path.isdir(REF_ASSETS), reason="reference assets absent")
def test_load_reference_scene1():
    instances, lights = load_scene_dir(os.path.join(REF_ASSETS, "scene1"))
    assert len(instances) == 1            # XShip.json
    assert instances[0].model == 0
    # rotationZ=180deg -> pi radians
    assert instances[0].rotation[2] == pytest.approx(math.pi)
    assert lights.n_dir == 1
    assert lights.n_spot == 1
    assert lights.n_point == 4            # the four pointlight JSONs
    # directional light colour from the JSON (4, 4, 4)
    np.testing.assert_allclose(np.asarray(lights.dir_color[0]), [4.0, 4.0, 4.0])


@pytest.mark.skipif(not os.path.isdir(REF_ASSETS), reason="reference assets absent")
def test_reference_quirk_point_lights_excluded():
    """include_point_lights=False replicates the reference's unloaded SIMD
    point lights (Core/Scene.cpp:20-27)."""
    _, lights = load_scene_dir(os.path.join(REF_ASSETS, "scene1"),
                               include_point_lights=False)
    assert lights.n_point == 0
