"""Shared tiny test scenes + configs (kept identical across tests so the
persistent compile cache is hit instead of recompiling per test)."""

import numpy as np

from physically_based_ray_tracer_tpu.config import RenderConfig
from physically_based_ray_tracer_tpu.scene.camera import Camera
from physically_based_ray_tracer_tpu.scene.lights import LightSet
from physically_based_ray_tracer_tpu.scene.procedural import (make_cornell_walls,
                                                              make_quad, make_sphere)
from physically_based_ray_tracer_tpu.scene.scene import Instance, MeshModel, build_scene

# packet_tile=64 so per-shard pixel counts (1024/8 = 128) stay tile-aligned:
# sharded and unsharded runs then group rays into identical packets and stay
# bit-identical (see parallel/shard.py docstring)
TINY = RenderConfig(width=32, height=32, bounces=2, antialias=False,
                    skybox=False, max_stack_depth=24, packet_tile=64)


def sphere_scene(lights=None, sky=None, sphere_kw=None):
    sphere = MeshModel.from_fat(make_sphere(radius=1.0, lat=12, lon=16),
                                **(sphere_kw or dict(base_color=(0.8, 0.3, 0.2),
                                                     roughness=0.4)))
    floor = MeshModel.from_fat(
        make_quad([-5, -1, -5], [5, -1, -5], [5, -1, 5], [-5, -1, 5]),
        base_color=(0.6, 0.6, 0.6), roughness=0.8)
    if lights is None:
        lights = LightSet.make(
            point_pos=[[2, 3, 2]], point_color=[[20, 20, 20]],
            dir_pos=[[5, 8, 3]], dir_color=[[1.5, 1.4, 1.2]],
            spot_pos=[[0, 4, 0]], spot_color=[[8, 8, 8]], spot_rot=[[0, -1, 0]],
        ).pad_points(4)
    scene, depth = build_scene([sphere, floor], [Instance(0), Instance(1)],
                               lights, sky=sky)
    cam = Camera.make(pos=(0, 1, 4), target=(0, 0, 0))
    return scene, cam


def cornell_scene(area_light=True):
    walls = make_cornell_walls(1.0)
    models = [MeshModel.from_fat(fat, base_color=color, roughness=0.9)
              for fat, color in walls]
    box = MeshModel.from_fat(
        make_sphere(center=(0.3, -0.6, -0.3), radius=0.35, lat=10, lon=14),
        base_color=(0.73, 0.73, 0.73), roughness=0.6)
    models.append(box)
    instances = [Instance(i) for i in range(len(models))]
    lights = LightSet.make(
        area_pos=[[0.0, 0.98, 0.0]], area_color=[[18.0, 15.0, 9.0]],
        area_u=[[0.25, 0.0, 0.0]], area_v=[[0.0, 0.0, 0.25]]) if area_light \
        else LightSet.make(point_pos=[[0, 0.9, 0]], point_color=[[3, 3, 3]])
    scene, depth = build_scene(models, instances, lights)
    cam = Camera.make(pos=(0, 0, 3.2), target=(0, 0, 0))
    return scene, cam
