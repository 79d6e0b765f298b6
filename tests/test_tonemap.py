"""Post-processing image pass (Core/Renderer.cpp:107-134 semantics)."""

import jax.numpy as jnp
import numpy as np

from physically_based_ray_tracer_tpu.ops import tonemap


def test_aberration_zero_is_identity():
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (8, 8, 3)), jnp.float32)
    out = tonemap.chromatic_aberration(img, 0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_aberration_shifts_red_blue_only():
    img = np.zeros((4, 8, 3), np.float32)
    img[:, 4] = [1.0, 1.0, 1.0]
    out = np.asarray(tonemap.chromatic_aberration(jnp.asarray(img), 2))
    # green untouched
    np.testing.assert_array_equal(out[:, :, 1], img[:, :, 1])
    # red at column 4 is blended with column 6 (which is 0): 0.75
    assert np.isclose(out[0, 4, 0], 0.75)
    # red at column 2 picks up 0.25 from column 4
    assert np.isclose(out[0, 2, 0], 0.25)


def test_vignette_darkens_corners_more_than_center():
    img = jnp.ones((16, 16, 3), jnp.float32)
    out = np.asarray(tonemap.vignette(img, 20.0, 0.3))
    assert out[8, 8, 0] > out[0, 0, 0]
    assert out[0, 0, 0] >= 0.0


def test_color_grade():
    img = jnp.ones((2, 2, 3), jnp.float32)
    out = np.asarray(tonemap.color_grade(img, (1.0, 0.5, 2.0)))
    np.testing.assert_allclose(out[0, 0], [1.0, 0.5, 2.0])


def test_aces_range():
    x = jnp.asarray(np.linspace(0, 10, 50, dtype=np.float32))[:, None] * jnp.ones((1, 3))
    y = np.asarray(tonemap.aces(x))
    assert (y >= 0).all() and (y <= 1.0).all()
    assert y[-1, 0] > 0.95  # bright maps near white


def test_full_chain_shapes():
    img = jnp.ones((8, 8, 3), jnp.float32)
    out = tonemap.post_process(img, aberration_intensity=1)
    assert out.shape == (8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()
