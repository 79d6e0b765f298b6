"""The HBM leaf queue (ping-pong DMA pipeline) must be result-identical to
the VMEM-resident path.

The bf16 kernel switches to per-visit group DMA when the scene's leaf
groups exceed VMEM_BF_GROUP_LIMIT; r5 made that path a one-deep software
pipeline (fetch leaf N+1 during leaf N's sweep, ops/pallas_bf16.py
leaf queue). No committed scene in the test suite is big enough to cross
the real limit, so these tests monkeypatch it to force the DMA path in
interpret mode and compare hit-for-hit against the resident path —
covering single-level, two-level (instance re-basing between discovery
and deferred sweep), closest and occlusion variants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physically_based_ray_tracer_tpu.ops import pallas_bf16 as pb
from physically_based_ray_tracer_tpu.scene.camera import Camera, primary_rays
from physically_based_ray_tracer_tpu.scene.lights import LightSet
from physically_based_ray_tracer_tpu.scene.procedural import make_quad, make_sphere
from physically_based_ray_tracer_tpu.scene.scene import (Instance, MeshModel,
                                                         build_scene,
                                                         build_scene_instanced)

B = 2048


def _rays(scene_cam):
    scene, cam = scene_cam
    ids = jnp.arange(B, dtype=jnp.int32)
    xs = (ids % 64).astype(jnp.float32)
    ys = (ids // 64).astype(jnp.float32)
    o, d = primary_rays(cam, xs, ys, 64, 32)
    return scene, o, d


@pytest.fixture(scope="module")
def single_level():
    sphere = MeshModel.from_fat(make_sphere(radius=1.0, lat=10, lon=16),
                                base_color=(0.8, 0.3, 0.2))
    floor = MeshModel.from_fat(
        make_quad([-4, -1, -4], [4, -1, -4], [4, -1, 4], [-4, -1, 4]))
    scene, _ = build_scene([sphere, floor], [Instance(0), Instance(1)],
                           LightSet.make(), dense_leaf_target=8)
    cam = Camera.make(pos=(0, 1, 4), target=(0, 0, 0))
    return scene, cam


@pytest.fixture(scope="module")
def two_level():
    sphere = MeshModel.from_fat(make_sphere(radius=0.8, lat=10, lon=16),
                                base_color=(0.8, 0.3, 0.2))
    floor = MeshModel.from_fat(
        make_quad([-4, -1, -4], [4, -1, -4], [4, -1, 4], [-4, -1, 4]))
    insts = [Instance(0, position=(dx, 0, dz))
             for dx in (-1.5, 1.5) for dz in (-1.5, 1.5)] + [Instance(1)]
    scene, _, _ = build_scene_instanced([sphere, floor], insts,
                                        LightSet.make(), legacy_bvh=False,
                                        dense_leaf_target=8)
    cam = Camera.make(pos=(0, 1.5, 5), target=(0, 0, 0))
    return scene, cam


def _compare(scene, o, d, monkeypatch):
    tmax = jnp.full((B,), 1e30, jnp.float32)
    hit_res = pb.intersect_closest_bf16(scene.dense, o, d, tmax,
                                        interpret=True)
    occ_res = pb.intersect_any_bf16(scene.dense, o, d,
                                    jnp.full((B,), 6.0), interpret=True)
    n_groups = scene.dense.groups_bf.shape[0] // pb.BF_ROWS
    assert n_groups > 2, "fixture too small to exercise the queue"
    monkeypatch.setattr(pb, "VMEM_BF_GROUP_LIMIT", 1)
    hit_dma = pb.intersect_closest_bf16(scene.dense, o, d, tmax,
                                        interpret=True)
    occ_dma = pb.intersect_any_bf16(scene.dense, o, d,
                                    jnp.full((B,), 6.0), interpret=True)
    np.testing.assert_array_equal(np.asarray(hit_res.prim),
                                  np.asarray(hit_dma.prim))
    np.testing.assert_allclose(np.asarray(hit_res.t), np.asarray(hit_dma.t),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(occ_res), np.asarray(occ_dma))
    # sanity: the comparison is not vacuous
    assert int(np.sum(np.asarray(hit_res.prim) >= 0)) > B // 4
    assert 0 < int(np.sum(np.asarray(occ_res))) < B


def test_leaf_queue_single_level(single_level, monkeypatch):
    scene, o, d = _rays(single_level)
    _compare(scene, o, d, monkeypatch)


def test_leaf_queue_two_level(two_level, monkeypatch):
    scene, o, d = _rays(two_level)
    _compare(scene, o, d, monkeypatch)
