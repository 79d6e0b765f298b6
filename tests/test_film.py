"""Film accumulation semantics (Core/Renderer.cpp:73-105)."""

import jax.numpy as jnp
import numpy as np

from physically_based_ray_tracer_tpu.config import RenderConfig
from physically_based_ray_tracer_tpu.render import film as film_mod

CFG = RenderConfig(width=2, height=2, gamma_corrected=False)


def test_running_mean_when_depth_stable():
    f = film_mod.FilmState.zeros(4)
    t = jnp.full((4,), 5.0)
    f, avg1 = film_mod.update(f, jnp.full((4, 3), 1.0), t, CFG)
    f, avg2 = film_mod.update(f, jnp.full((4, 3), 3.0), t, CFG)
    np.testing.assert_allclose(np.asarray(avg2), 2.0)
    assert float(f.spp[0]) == 2.0


def test_reset_on_depth_change():
    f = film_mod.FilmState.zeros(4)
    f, _ = film_mod.update(f, jnp.full((4, 3), 1.0), jnp.full((4,), 5.0), CFG)
    # depth jump > EPSILON resets the mean
    f, avg = film_mod.update(f, jnp.full((4, 3), 3.0), jnp.full((4,), 6.0), CFG)
    np.testing.assert_allclose(np.asarray(avg), 3.0)
    assert float(f.spp[0]) == 1.0


def test_no_reset_within_epsilon():
    f = film_mod.FilmState.zeros(4)
    f, _ = film_mod.update(f, jnp.full((4, 3), 1.0), jnp.full((4,), 5.0), CFG)
    f, avg = film_mod.update(f, jnp.full((4, 3), 3.0), jnp.full((4,), 5.005), CFG)
    np.testing.assert_allclose(np.asarray(avg), 2.0)


def test_gamma_is_sqrt_pre_accumulation():
    cfg = CFG.replace(gamma_corrected=True)
    f = film_mod.FilmState.zeros(4)
    f, avg = film_mod.update(f, jnp.full((4, 3), 0.25), jnp.full((4,), 1.0), cfg)
    np.testing.assert_allclose(np.asarray(avg), 0.5)


def test_no_accumulate_mode():
    cfg = CFG.replace(accumulate=False)
    f = film_mod.FilmState.zeros(4)
    f, avg1 = film_mod.update(f, jnp.full((4, 3), 1.0), jnp.full((4,), 5.0), cfg)
    f, avg2 = film_mod.update(f, jnp.full((4, 3), 3.0), jnp.full((4,), 5.0), cfg)
    np.testing.assert_allclose(np.asarray(avg2), 3.0)
