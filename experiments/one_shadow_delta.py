"""Image delta of the one_shadow_ray point-NEE estimator -> docs/ONE_SHADOW.json.

VERDICT r2 weak #5 / next-step (a): before flipping the bench to the
1-lane-per-vertex point-light estimator, record what it changes. Renders
the bench scene at reduced resolution with many accumulated samples under
both estimators and reports the converged difference.

Estimator note (ADVICE r2): one_shadow_ray converges to the physically
consistent per-light sum Σ_j bsdf(l_j)·contrib_j; the reference's NP-ray
path converges to bsdf(l_sel)·Σ_j contrib_j (one random light's BRDF
against the summed contributions, Core/Renderer.cpp:264-268). The delta
below is that estimator difference (it is NOT noise — both runs are
converged), concentrated where point-light specular matters.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/pbrt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402


def main():
    from bench import build_bench_scene
    from physically_based_ray_tracer_tpu.config import RenderConfig
    from physically_based_ray_tracer_tpu.render.renderer import Renderer

    scene, cam, depth = build_bench_scene()
    base = RenderConfig(width=160, height=90, bounces=4, antialias=False,
                        skybox=False, max_stack_depth=32,
                        depth_keyed_accum=False)
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 48

    imgs = {}
    for flag in (False, True):
        cfg = base.replace(one_shadow_ray=flag)
        r = Renderer(scene, cam, cfg)
        for s in range(spp):
            img = r.tick(jax.random.key(s))
        imgs[flag] = img

    diff = imgs[True] - imgs[False]
    out = {
        "config": f"160x90, 4-bounce, {spp} spp accumulated, bench scene",
        "mse": float(np.mean(diff ** 2)),
        "mean_abs": float(np.mean(np.abs(diff))),
        "max_abs": float(np.abs(diff).max()),
        "mean_img": float(imgs[False].mean()),
        "note": "converged estimator difference (see module docstring); "
                "the flagship bench runs one_shadow_ray=True with this "
                "delta on record",
    }
    docs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs")
    with open(os.path.join(docs, "ONE_SHADOW.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
