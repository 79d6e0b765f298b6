"""Reference-format JSON scene serialization.

The reference's JSON files ARE its persistent state (SURVEY.md §5): camera
(``assets/prefabs/camera.json``, Core/Camera.cpp:13-16), GameObjects
(``assets/scene1/*.json``, Core/GameObject.cpp:13-17 + Transform fields),
lights (``assets/scene1/{pointlights,directionallights,spotlights}/*.json``,
Core/LightTransform.cpp:14-24). This module reads and writes those exact
formats so reference scenes load unmodified.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

from physically_based_ray_tracer_tpu.scene.camera import Camera
from physically_based_ray_tracer_tpu.scene.lights import LightSet, lights_from_reference_json
from physically_based_ray_tracer_tpu.scene.scene import Instance


def load_camera_json(path: str) -> Camera:
    """Read camera.json {pX,pY,pZ,tX,tY,tZ} (Core/Camera.cpp:13-16)."""
    with open(path) as f:
        d = json.load(f)
    return Camera.make(pos=(d["pX"], d["pY"], d["pZ"]),
                       target=(d["tX"], d["tY"], d["tZ"]))


def save_camera_json(path: str, cam: Camera):
    """Write-back format of Camera::HandleInput (Core/Camera.cpp:178-192)."""
    p = np.asarray(cam.pos)
    t = np.asarray(cam.target)
    data = {"pX": float(p[0]), "pY": float(p[1]), "pZ": float(p[2]),
            "tX": float(t[0]), "tY": float(t[1]), "tZ": float(t[2])}
    with open(path, "w") as f:
        json.dump(data, f, indent=4)


def load_gameobject_json(path: str) -> Instance:
    """Read a GameObject JSON (Core/GameObject.cpp:13-17 + the
    positionX/rotationX fields consumed by its Transform).

    Rotations are stored in degrees in the scene files (e.g. XShip.json
    rotationZ = 180) and fed to glm's radians-based Euler constructor by the
    reference after a world-load path that passes them through unchanged —
    we convert degrees->radians here, which renders XShip upside-down as the
    file intends.
    """
    with open(path) as f:
        d = json.load(f)
    deg = math.pi / 180.0
    return Instance(
        model=int(d.get("modelIndex", 0)),
        position=(d.get("positionX", 0.0), d.get("positionY", 0.0), d.get("positionZ", 0.0)),
        rotation=(d.get("rotationX", 0.0) * deg, d.get("rotationY", 0.0) * deg,
                  d.get("rotationZ", 0.0) * deg),
        scale=(d.get("scaleX", 1.0), d.get("scaleY", 1.0), d.get("scaleZ", 1.0)),
        name=os.path.splitext(os.path.basename(path))[0])


def save_gameobject_json(path: str, inst: Instance, physics_type: str = "static"):
    """Write-back format of GameObject::Update (Core/GameObject.cpp:24-51)."""
    rad = 180.0 / math.pi
    data = {
        "modelIndex": inst.model,
        "physicsType": physics_type,
        "positionX": float(inst.position[0]), "positionY": float(inst.position[1]),
        "positionZ": float(inst.position[2]),
        "rotationX": float(inst.rotation[0] * rad), "rotationY": float(inst.rotation[1] * rad),
        "rotationZ": float(inst.rotation[2] * rad),
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=4)


def save_light_json(path: str, position, color, rotation=(0.0, 0.0, 0.0)):
    """LightTransform::Update format (Core/LightTransform.cpp:30-51)."""
    data = {"pX": float(position[0]), "pY": float(position[1]), "pZ": float(position[2]),
            "cX": float(color[0]), "cY": float(color[1]), "cZ": float(color[2]),
            "rX": float(rotation[0]), "rY": float(rotation[1]), "rZ": float(rotation[2])}
    with open(path, "w") as f:
        json.dump(data, f, indent=4)


def load_scene_dir(scene_dir: str, include_point_lights: bool = True
                   ) -> tuple[list[Instance], LightSet]:
    """Scan a reference scene directory (the analogue of Scene::FindSerialized,
    Core/Scene.cpp:279-317): every top-level ``*.json`` is a GameObject; light
    subdirectories populate the LightSet.

    ``include_point_lights=False`` replicates the reference quirk that point
    lights are never loaded from JSON (Scene::Init only scans types 0/2/3,
    Core/Scene.cpp:20-27 — the SIMD point lights start zeroed).
    """
    instances = []
    for f in sorted(os.listdir(scene_dir)):
        p = os.path.join(scene_dir, f)
        if f.endswith(".json") and os.path.isfile(p):
            instances.append(load_gameobject_json(p))
    lights = lights_from_reference_json(scene_dir)
    if not include_point_lights:
        lights = LightSet.make(
            dir_pos=np.asarray(lights.dir_pos), dir_color=np.asarray(lights.dir_color),
            spot_pos=np.asarray(lights.spot_pos), spot_color=np.asarray(lights.spot_color),
            spot_rot=np.asarray(lights.spot_rot))
    return instances, lights
