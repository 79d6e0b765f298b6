"""Scaling harness smoke on the virtual CPU mesh (timing is meaningless on
virtual devices; the harness mechanics + shapes are what's validated)."""

from tests.scenes import TINY, sphere_scene


def test_measure_scaling_runs():
    from physically_based_ray_tracer_tpu.parallel.scaling import measure_scaling
    scene, cam = sphere_scene()
    results = measure_scaling(scene, cam, TINY, device_counts=[1, 2, 4], iters=1)
    assert [r["devices"] for r in results] == [1, 2, 4]
    for r in results:
        assert r["ms"] > 0 and r["mrays_per_s"] > 0
    assert results[0]["efficiency"] == 1.0
