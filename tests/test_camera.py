"""Camera: primary rays, Panini, skydome sampling (Core/Camera.cpp parity)."""

import jax.numpy as jnp
import numpy as np

from physically_based_ray_tracer_tpu.scene.camera import (Camera, camera_basis,
                                                          panini_projection,
                                                          primary_rays,
                                                          sample_skybox)


def test_center_ray_points_ahead():
    cam = Camera.make(pos=(1, 2, 3), target=(1, 2, 0))  # looking -z
    o, d = primary_rays(cam, jnp.asarray([64.0]), jnp.asarray([36.0]), 128, 72)
    np.testing.assert_allclose(np.asarray(o)[0], [1, 2, 3], rtol=1e-6)
    # center of screen: direction ~ ahead = (0,0,-1)
    np.testing.assert_allclose(np.asarray(d)[0], [0, 0, -1], atol=1e-5)


def test_corner_rays_match_reference_plane():
    """Reference plane: distance 2 along ahead, half-extents (aspect, 1)
    (Core/Camera.cpp:34-36). Pixel (0,0) maps exactly to topLeft."""
    cam = Camera.make(pos=(0, 0, 0), target=(0, 0, -1))
    basis = camera_basis(cam, aspect=2.0)
    o, d = primary_rays(cam, jnp.asarray([0.0]), jnp.asarray([0.0]), 128, 64)
    want = np.asarray(basis.top_left) / np.linalg.norm(np.asarray(basis.top_left))
    np.testing.assert_allclose(np.asarray(d)[0], want, atol=1e-6)


def test_rays_normalized():
    cam = Camera.make(pos=(0, 1, 4), target=(0, 0, 0))
    xs = jnp.asarray(np.random.default_rng(0).uniform(0, 128, 100), jnp.float32)
    ys = jnp.asarray(np.random.default_rng(1).uniform(0, 72, 100), jnp.float32)
    _, d = primary_rays(cam, xs, ys, 128, 72)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-5)


def test_panini_center_is_forward():
    ndc = jnp.asarray([[0.0, 0.0]])
    d = np.asarray(panini_projection(ndc, np.pi / 4, 2.0))
    np.testing.assert_allclose(d[0], [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_panini_rays_normalized_and_finite():
    cam = Camera.make(pos=(0, 0, 0), target=(0, 0, -1))
    xs = jnp.asarray(np.linspace(0, 127, 16), jnp.float32)
    ys = jnp.asarray(np.linspace(0, 71, 16), jnp.float32)
    _, d = primary_rays(cam, xs, ys, 128, 72, panini=True)
    d = np.asarray(d)
    assert np.isfinite(d).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)


def test_skybox_constant():
    sky = jnp.full((8, 16, 3), 0.7, jnp.float32)
    d = jnp.asarray([[0, 1, 0], [0, -1, 0], [1, 0, 0], [0, 0, 1]], jnp.float32)
    c = np.asarray(sample_skybox(sky, d))
    np.testing.assert_allclose(c, 0.7, rtol=1e-5)


def test_skybox_gradient_vertical():
    """v = acos(y)/pi: up samples the top rows, down the bottom rows."""
    h, w = 16, 32
    grad = np.linspace(0, 1, h, dtype=np.float32)[:, None, None] * np.ones((1, w, 3), np.float32)
    sky = jnp.asarray(grad)
    # exactly at the bottom pole v=1 wraps to row 0 (reference % semantics,
    # Core/Camera.cpp:52), so probe slightly above the poles instead
    up = float(sample_skybox(sky, jnp.asarray([[0.14, 0.99, 0.0]]))[0, 0])
    down = float(sample_skybox(sky, jnp.asarray([[0.14, -0.99, 0.0]]))[0, 0])
    # near the bottom pole bilinear blends with the wrapped row 0 (reference
    # % semantics), so the floor is ~0.6 rather than ~1.0
    assert up < 0.2 and down > 0.6


def test_hdr_reader_roundtrip(tmp_path):
    """Write a tiny uncompressed .hdr, read it back (Camera skydome path)."""
    from physically_based_ray_tracer_tpu.utils.image import read_hdr
    h, w = 4, 8
    rng = np.random.default_rng(0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = rng.integers(10, 255, (h, w, 3))
    rgbe[..., 3] = 128  # exponent 2^(128-136) = 1/256
    path = tmp_path / "t.hdr"
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())
    img = read_hdr(str(path))
    assert img.shape == (h, w, 3)
    want = rgbe[..., :3].astype(np.float32) * (2.0 ** (128 - 136))
    np.testing.assert_allclose(img, want, rtol=1e-6)
