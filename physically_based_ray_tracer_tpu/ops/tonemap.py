"""Image-space post-processing.

The reference applies chromatic aberration, vignette and color grading
inline in the pixel loop (Core/Renderer.cpp:107-134); here they are a
separable batched image pass (SURVEY.md §7 build plan step 5). ACES is the
reference's commented-out alternative tonemap (Core/Renderer.cpp:75) —
provided as an option.
"""

from __future__ import annotations

import jax.numpy as jnp


def chromatic_aberration(img: jnp.ndarray, intensity: int) -> jnp.ndarray:
    """Red/blue channel shift along x (Core/Renderer.cpp:109-121).

    img: (H, W, 3). ``intensity`` is a static int pixel shift (the reference's
    camera.abberationIntensity; clamped gathers at the borders).
    """
    if intensity == 0:
        return img
    w = img.shape[1]
    xs = jnp.arange(w)
    x_r = jnp.clip(xs + intensity, 0, w - 1)
    x_b = jnp.clip(xs - intensity, 0, w - 1)
    r = 0.75 * img[:, :, 0] + 0.25 * img[:, x_r, 0]
    g = img[:, :, 1]
    b = 0.75 * img[:, :, 2] + 0.25 * img[:, x_b, 2]
    return jnp.stack([r, g, b], axis=-1)


def vignette(img: jnp.ndarray, intensity, radius) -> jnp.ndarray:
    """uv*(1-uv) falloff vignette (Core/Renderer.cpp:123-127)."""
    h, w = img.shape[0], img.shape[1]
    ux = (jnp.arange(w) / w)[None, :]
    uy = (jnp.arange(h) / h)[:, None]
    vig = (ux * (1.0 - ux)) * (uy * (1.0 - uy)) * intensity
    vig = jnp.power(jnp.maximum(vig, 0.0), radius)
    return img * vig[..., None]


def color_grade(img: jnp.ndarray, grading) -> jnp.ndarray:
    """Per-channel multiplier (Core/Renderer.cpp:130)."""
    return img * jnp.asarray(grading)[None, None, :3]


def aces(x: jnp.ndarray) -> jnp.ndarray:
    """Narkowicz ACES fit — the reference's commented-out alternative."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


# Named post-process presets (Core/Camera.h:11-29, applied by the UI's
# Preset buttons, Core/UserInterface.cpp:238-318). Each entry:
# (grading rgb, fov deg, panini distortion, vignette intensity,
#  vignette radius, aberration px). Preset 2 is the engine's defaults.
POST_PRESETS = {
    1: {"grading": (1.0, 1.0, 1.2), "fov": 90.0, "distortion": 2.0,
        "vignette_intensity": 5.5, "vignette_radius": 0.8,
        "aberration_intensity": -1},
    2: {"grading": (1.0, 1.0, 1.0), "fov": 40.0, "distortion": 40.0,
        "vignette_intensity": 20.0, "vignette_radius": 0.3,
        "aberration_intensity": 0},
}


def post_process(img: jnp.ndarray, aberration_intensity: int = 0,
                 vignette_intensity: float = 20.0, vignette_radius: float = 0.3,
                 grading=(1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Full reference chain: aberration -> grading -> vignette
    (order of Core/Renderer.cpp:107-134)."""
    img = chromatic_aberration(img, aberration_intensity)
    img = color_grade(img, grading)
    img = vignette(img, vignette_intensity, vignette_radius)
    return img
