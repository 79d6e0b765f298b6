"""Certify BASELINE config #3 at FULL resolution: scene1 (SciFiHelmet +
scene JSON lights, all four light types) at 1920x1080 on the real chip.

Matches the capture semantics of Renderer::Capture (Core/Renderer.cpp:
437-465) at the golden configuration (bounces=2, no AA, stochastic NEE)
scaled from the certified 480x270 game-res golden to 1080p. Produces:
  * docs/SCENE1_1080P.json  — frame ms (median of 3), honest Mrays/s
  * docs/scene1_1080p.png   — the full-resolution capture
  * tests/golden/scene1_1080_ds4.png — 4x-downsampled CI golden

Run:  python experiments/scene1_1080p.py     (one TPU job at a time)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_scene1
    from physically_based_ray_tracer_tpu.config import RenderConfig
    from physically_based_ray_tracer_tpu.render.renderer import Renderer
    from physically_based_ray_tracer_tpu.utils.image import write_png
    from physically_based_ray_tracer_tpu.utils.timer import ray_count

    scene, cam, depth = build_scene1()
    cfg = RenderConfig(width=1920, height=1080, bounces=2, antialias=False,
                       skybox=False, max_stack_depth=max(depth + 2, 40))
    r = Renderer(scene, cam, cfg)
    t0 = time.perf_counter()
    img = r.tick()
    compile_and_first = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        img = r.tick()
        times.append(time.perf_counter() - t0)
    t_med = sorted(times)[1]

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    png = os.path.join(root, "docs", "scene1_1080p.png")
    write_png(png, img)
    ds = img.reshape(270, 4, 480, 4, 3).mean(axis=(1, 3))
    golden = os.path.join(root, "tests", "golden", "scene1_1080_ds4.png")
    write_png(golden, ds)

    slots = ray_count(cfg, cfg.n_pixels,
                      n_point_lights=int(scene.lights.n_point))
    out = {
        "what": "BASELINE config #3 certified at FULL 1080p on the real "
                "chip: scene1 meshes (SciFiHelmet), all four light types "
                "(4 point + dir + spot JSON lights + area), capture "
                "semantics of Core/Renderer.cpp:437-465",
        "resolution": "1920x1080", "bounces": 2, "antialias": False,
        "frame_ms_median_of_3": round(t_med * 1e3, 1),
        "first_call_incl_compile_s": round(compile_and_first, 1),
        "lane_slot_mrays_per_s": round(slots / t_med / 1e6, 2),
        "mean_pixel_value": round(float(img.mean()), 4),
        "capture": "docs/scene1_1080p.png",
        "ci_golden": "tests/golden/scene1_1080_ds4.png (4x box filter)",
        "device": str(jax.devices()[0]),
    }
    with open(os.path.join(root, "docs", "SCENE1_1080P.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
