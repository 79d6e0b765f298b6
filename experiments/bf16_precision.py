"""Converged bf16-vs-f32 engine agreement, WITH the estimator noise
floor (r5, post exact-occlusion fix).

A bf16 closest-pass edge tie re-seeds the entire path suffix of that
lane, so at finite spp the bf16/f32 delta contains ESTIMATOR NOISE, not
just engine bias — the honest comparison is against the delta between
two f32 renders with disjoint RNG streams (the noise floor at the same
spp). If bf16-vs-f32 ~ f32-vs-f32', the engines agree to within the
estimator's own variance.

Run:  python experiments/bf16_precision.py   (CPU, ~45 min)
Writes docs/BF16_PRECISION_r05.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPP = 48
W_RES, H_RES = 160, 90


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/pbrt_tpu_jax_cache")
    import numpy as np

    from bench import build_bench_scene
    from physically_based_ray_tracer_tpu.config import RenderConfig
    from physically_based_ray_tracer_tpu.render.renderer import Renderer

    scene, cam, depth = build_bench_scene()
    cfg = RenderConfig(width=W_RES, height=H_RES, bounces=4, antialias=True,
                       skybox=False, max_stack_depth=max(depth + 2, 32),
                       one_shadow_ray=True)

    def render(lp, seed):
        r = Renderer(scene, cam, cfg.replace(leaf_precision=lp))
        img = None
        for _ in range(SPP):
            img = r.tick(jax.random.key(seed))
        return img

    imgs = {}
    for tag, (lp, seed) in dict(bf16=("bf16", 0), f32=("f32", 0),
                                f32b=("f32", 1)).items():
        t0 = time.time()
        imgs[tag] = render(lp, seed)
        print(tag, "done", round(time.time() - t0, 1), "s", flush=True)

    def stats(a, b):
        d = np.abs(a - b)
        return dict(mean_abs=round(float(d.mean()), 6),
                    p99_abs=round(float(np.quantile(d, 0.99)), 5),
                    p999_abs=round(float(np.quantile(d, 0.999)), 5),
                    max_abs=round(float(d.max()), 4),
                    mse=round(float(((a - b) ** 2).mean()), 7),
                    pixels_over_1pct=round(
                        float((d.max(-1) > 0.01).mean()), 5))

    out = dict(
        what=("bf16-vs-f32 agreement at %d spp with the f32-vs-f32' "
              "noise floor (disjoint RNG streams)" % SPP),
        resolution=[W_RES, H_RES], spp=SPP,
        bf16_vs_f32=stats(imgs["bf16"], imgs["f32"]),
        noise_floor_f32_vs_f32b=stats(imgs["f32"], imgs["f32b"]),
        note=("occlusion is exact on both engines (r5 fix); the bf16 "
              "residual is closest-pass edge ties whose re-seeded path "
              "suffixes read as estimator noise at finite spp — compare "
              "each statistic against the noise floor, not against 0"))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "BF16_PRECISION_r05.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
