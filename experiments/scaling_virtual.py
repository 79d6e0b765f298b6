"""Scaling run on the virtual 8-device CPU mesh -> docs/SCALING_virtual8.json.

Committed artifact for the multi-chip story (VERDICT round-1 #8): rays/s and
efficiency at 1/2/4/8 devices through the full sharded frame function.
Virtual CPU devices share one host's cores, so *efficiency* here validates
sharding mechanics and collective layout, not ICI bandwidth — the same
harness (parallel/scaling.py) runs unchanged on a real slice.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/pbrt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from physically_based_ray_tracer_tpu.config import RenderConfig
    from physically_based_ray_tracer_tpu.parallel.scaling import measure_scaling
    from physically_based_ray_tracer_tpu.scene.presets import sphere_demo

    scene, cam = sphere_demo()
    # 512x512: per-device work dominates fixed dispatch overhead (the
    # VERDICT r2 note on the old 128x64 run, where it did not). The virtual
    # devices SHARE one host's cores, so wall-clock cannot scale linearly
    # here; the meaningful check is that per-device work divides evenly and
    # the sharded program adds no super-linear overhead. On a real slice the
    # same harness measures true ICI scaling.
    cfg = RenderConfig(width=512, height=512, bounces=2, antialias=False,
                       skybox=False, max_stack_depth=24)
    rows = measure_scaling(scene, cam, cfg, device_counts=[1, 2, 4, 8])
    from physically_based_ray_tracer_tpu.parallel.scaling import \
        measure_work_invariance
    inv = measure_work_invariance(scene, cam, cfg, divisors=(1, 2, 4, 8))
    out = {"config": "512x512, 2-bounce, sphere_demo, virtual CPU mesh "
                     "(shared-core caveat: see experiments/scaling_virtual.py)",
           "rows": rows,
           "work_invariance": {
               "what": "UNSHARDED wall-time of exactly the pixel subset "
                       "each shard owns, vs cost(B)/n — separates the "
                       "sharded program's per-device work (this) from "
                       "host-core contention (the wall-clock table above). "
                       "normalized_cost ~= 1 means per-device work is "
                       "invariant under sharding; the forward frame has "
                       "zero cross-chip collectives, so real-ICI "
                       "efficiency = this x (1 - launch skew).",
               "rows": inv,
           },
           "honest_status": "the BASELINE >90% multi-HOST criterion remains "
                            "UNVERIFIED in this single-chip environment; "
                            "virtual-mesh wall-clock is core-bound (2 "
                            "physical cores) and is not ICI evidence."}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "SCALING_virtual8.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
