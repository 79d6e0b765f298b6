"""Debug-draw overlay (GL DebugDrawer analogue, Core/DebugDrawer.h:34-106):
projection must invert the primary-ray construction, and BVH wireframes
must land on the image."""

import jax.numpy as jnp
import numpy as np

from physically_based_ray_tracer_tpu.scene.camera import Camera, primary_rays
from physically_based_ray_tracer_tpu.utils.debug_draw import (bvh_level_boxes,
                                                              draw_aabbs,
                                                              project_points)


def test_project_inverts_primary_rays():
    cam = Camera.make(pos=(0, 2, 7), target=(0, 0, 0))
    W, H = 128, 96
    xs = jnp.asarray([10.0, 64.0, 100.0, 30.0])
    ys = jnp.asarray([5.0, 48.0, 90.0, 70.0])
    o, d = primary_rays(cam, xs, ys, W, H)
    pts = np.asarray(o + d * 3.7)            # arbitrary points along the rays
    px, py, front = project_points(cam, pts, W, H)
    assert front.all()
    np.testing.assert_allclose(px, np.asarray(xs), atol=0.25)
    np.testing.assert_allclose(py, np.asarray(ys), atol=0.25)


def test_behind_camera_not_drawn():
    cam = Camera.make(pos=(0, 0, 5), target=(0, 0, 0))
    _, _, front = project_points(cam, np.array([[0.0, 0.0, 9.0]]), 64, 64)
    assert not front.any()


def test_draw_aabbs_marks_pixels():
    cam = Camera.make(pos=(0, 0, 5), target=(0, 0, 0))
    img = np.zeros((96, 128, 3), np.float32)
    out = draw_aabbs(img, cam, np.array([[-1.0, -1, -1]]),
                     np.array([[1.0, 1, 1]]), color=(0, 1, 0))
    assert (out[..., 1] > 0).sum() > 50      # wireframe pixels present
    assert (img == 0).all()                  # input untouched (copy)


def test_bvh_level_boxes():
    from physically_based_ray_tracer_tpu.bvh.builder import build_bvh
    from physically_based_ray_tracer_tpu.scene.procedural import make_sphere
    tri = make_sphere(radius=1.0, lat=8, lon=10)[0].reshape(-1, 3, 3)
    bvh = build_bvh(tri, leaf_size=4)
    lo0, hi0 = bvh_level_boxes(bvh.nodes_box, bvh.nodes_child, 0)
    assert lo0.shape == (2, 3)
    lo2, hi2 = bvh_level_boxes(bvh.nodes_box, bvh.nodes_child, 2)
    assert lo2.shape[0] > lo0.shape[0]
    assert (hi2 >= lo2 - 1e-6).all()
