"""Per-pixel debugger (Debugger-tab analogue, Core/UserInterface.cpp:141-236):
the debug tap must observe the SAME integrator, not a re-implementation —
pinned by checking the tap's radiance equals the untapped render."""

import jax
import jax.numpy as jnp
import numpy as np

from physically_based_ray_tracer_tpu.render.debugger import (format_trace,
                                                             pixel_grid,
                                                             trace_pixel)
from physically_based_ray_tracer_tpu.render.integrator import trace_paths
from physically_based_ray_tracer_tpu.scene.camera import primary_rays

from tests.scenes import TINY, sphere_scene


def test_trace_pixel_records_real_path():
    scene, cam = sphere_scene()
    cfg = TINY
    x, y = cfg.width // 2, cfg.height // 2
    recs = trace_pixel(scene, cam, cfg, x, y)
    assert recs[-1].keys() == {"radiance"}
    first = recs[0]
    assert first["bounce"] == 0
    assert first["hit_prim"] >= 0          # centre pixel sees the sphere
    assert np.isfinite(first["hit_t"]) and first["hit_t"] > 0
    assert np.linalg.norm(first["shad_n"]) > 0.9
    txt = format_trace(recs)
    assert "bounce 0" in txt and "final radiance" in txt


def test_debug_tap_matches_untapped_integrator():
    scene, cam = sphere_scene()
    cfg = TINY
    key = jax.random.key(1)
    pid = jnp.asarray([cfg.width * (cfg.height // 2) + cfg.width // 2],
                      jnp.int32)
    xs = (pid % cfg.width).astype(jnp.float32)
    ys = (pid // cfg.width).astype(jnp.float32)
    o, d = primary_rays(cam, xs, ys, cfg.width, cfg.height)
    rad_plain, _ = trace_paths(scene, cfg, o, d, pid, key, 0)
    rad_tap, _, dbg = trace_paths(scene, cfg, o, d, pid, key, 0,
                                  collect_debug=True)
    np.testing.assert_array_equal(np.asarray(rad_plain), np.asarray(rad_tap))
    assert dbg["hit_t"].shape[0] == cfg.bounces


def test_pixel_grid_shape():
    scene, cam = sphere_scene()
    cfg = TINY
    g = pixel_grid(scene, cam, cfg, cfg.width // 2, cfg.height // 2, radius=3)
    assert g.shape == (6, 6, 3)
    assert np.isfinite(g).all()
