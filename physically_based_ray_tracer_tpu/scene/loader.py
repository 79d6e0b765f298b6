"""High-level scene loading: reference scene directories -> SceneData.

The analogue of ``Scene::Init`` (Core/Scene.cpp:10-28): load models, scan the
scene directory's GameObject JSONs, build the acceleration structure, load
lights — plus the camera from ``prefabs/camera.json`` and the skydome HDR
when present (Core/Camera.cpp:9: ``assets/skydomes/workshop3.hdr``, absent
from the reference repo; loading is optional here too).
"""

from __future__ import annotations

import os

import numpy as np

from physically_based_ray_tracer_tpu.models.gltf import load_gltf
from physically_based_ray_tracer_tpu.scene.camera import Camera
from physically_based_ray_tracer_tpu.scene.scene import (SceneData,
                                                         build_scene,
                                                         build_scene_instanced)
from physically_based_ray_tracer_tpu.scene.serialization import (load_camera_json,
                                                                 load_scene_dir)


def load_reference_scene(assets_root: str, scene_name: str = "scene1",
                         model_paths: list[str] | None = None,
                         include_point_lights: bool = True,
                         load_sky: bool = True,
                         instanced: bool = True,
                         return_handle: bool = False):
    """Load a reference-format asset tree.

    ``model_paths``: glTF/GLB files in modelIndex order; defaults to the
    reference scene1 model list (SciFiHelmet only, Core/Scene.cpp:14).

    ``instanced=True`` (production default) builds the two-level TLAS
    structure — shared BLAS per model, the reference's per-frame dynamic
    design (Core/Renderer.cpp:22-41) — so transforms can be refreshed with
    ``rebuild_scene`` without re-uploading geometry. ``return_handle=True``
    additionally returns the InstancedScene handle that rebuild needs.

    Returns (scene_data, camera, bvh_depth[, handle]).
    """
    if model_paths is None:
        model_paths = [os.path.join(
            assets_root, "prefabs/models/SciFiHelmet/SciFiHelmet.gltf")]

    models = [load_gltf(p) for p in model_paths]
    scene_dir = os.path.join(assets_root, scene_name)
    instances, lights = load_scene_dir(scene_dir,
                                       include_point_lights=include_point_lights)
    lights = lights.pad_points(4)

    sky = None
    if load_sky:
        sky_path = os.path.join(assets_root, "skydomes/workshop3.hdr")
        if os.path.exists(sky_path):
            from physically_based_ray_tracer_tpu.utils.image import read_hdr
            sky = read_hdr(sky_path)

    handle = None
    if instanced:
        scene, handle, depth = build_scene_instanced(models, instances,
                                                     lights, sky=sky)
    else:
        scene, depth = build_scene(models, instances, lights, sky=sky)

    cam_path = os.path.join(assets_root, "prefabs/camera.json")
    cam = (load_camera_json(cam_path) if os.path.exists(cam_path)
           else Camera.make((0, 0, 3), (0, 0, 0)))
    if return_handle:
        return scene, cam, depth, handle
    return scene, cam, depth
