"""Differentiable rendering entry points.

The reference engine has no gradients at all; differentiability is a
first-class goal of the TPU build (BASELINE.json): pixel values are
differentiable w.r.t. material albedo/roughness, light parameters, and
camera/object transforms. Strategy (SURVEY.md §7): detached sampling — hit
*topology* (which prim, which lobe, which light) carries no gradient, while
(t, u, v), shading, NEE and accumulation are analytic jnp math.

Supported parameter groups (``apply_params``):
    base_color  (M, 3)  per-model albedo        -> scene.mat_base
    roughness   (M,)    per-model roughness     -> scene.mat_rough
    metalness   (M,)    per-model metalness     -> scene.mat_metal
    emissive    (M, 3)  per-model emission      -> scene.mat_emissive
    point_color (NP, 3) point-light intensity   -> lights.point_color
    dir_color   (ND, 3)                          -> lights.dir_color
    area_color  (NA, 3)                          -> lights.area_color
    translation (Ninst, 3) per-instance offset  -> world geometry (tri_v0,
        corner data); BVH topology is frozen (valid for small perturbations —
        the differentiable-rendering convention for silhouette-free grads)
    camera_pos  (3,)                             -> camera position
    camera_target (3,)                           -> camera target
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from physically_based_ray_tracer_tpu.config import RenderConfig
from physically_based_ray_tracer_tpu.render.integrator import render_sample
from physically_based_ray_tracer_tpu.scene.camera import Camera
from physically_based_ray_tracer_tpu.scene.scene import SceneData


def apply_params(scene: SceneData, cam: Camera, params: dict):
    """Return (scene', cam') with parameter group overrides applied."""
    s = scene
    if "base_color" in params:
        s = s._replace(mat_base=params["base_color"])
    if "roughness" in params:
        s = s._replace(mat_rough=params["roughness"])
    if "metalness" in params:
        s = s._replace(mat_metal=params["metalness"])
    if "emissive" in params:
        s = s._replace(mat_emissive=params["emissive"])
    lights = s.lights
    if "point_color" in params:
        lights = lights._replace(point_color=params["point_color"])
    if "dir_color" in params:
        lights = lights._replace(dir_color=params["dir_color"])
    if "area_color" in params:
        lights = lights._replace(area_color=params["area_color"])
    if lights is not s.lights:
        s = s._replace(lights=lights)
    if "translation" in params:
        # per-instance world offset; gathers the per-prim instance id.
        off = params["translation"]                       # (Ninst, 3)
        per_prim = jnp.take(off, s.prim_inst, axis=0)     # (P, 3)
        s = s._replace(
            tri_v0=s.tri_v0 + per_prim,
            # e1/e2 are translation-invariant; corner normals too.
        )
        # NOTE: bvh geometry is intentionally left untouched (stop_gradient
        # + frozen topology); hits come from the baked BVH, shading from the
        # translated tri_v0 via refine_hit.
    if "camera_pos" in params:
        cam = cam._replace(pos=params["camera_pos"])
    if "camera_target" in params:
        cam = cam._replace(target=params["camera_target"])
    return s, cam


def render_color(scene: SceneData, cam: Camera, cfg: RenderConfig, key,
                 sample, pixel_ids):
    """Raw linear radiance for a pixel batch (no film) — the differentiable
    quantity; gamma/accumulation are monotone postprocessing."""
    color, _ = render_sample(scene, cam, cfg, key, sample, pixel_ids)
    return color


def make_loss_fn(scene: SceneData, cam: Camera, cfg: RenderConfig, target,
                 pixel_ids, axis_name: str | None = None):
    """L2 image loss over a pixel batch as a function of a params dict.

    With ``axis_name`` set (inside shard_map), loss and grads are averaged
    over the mesh axis — the gradient all-reduce over ICI of SURVEY.md §5.
    """

    def loss_fn(params, key, sample):
        s, c = apply_params(scene, cam, params)
        color = render_color(s, c, cfg, key, sample, pixel_ids)
        loss = jnp.mean((color - target) ** 2)
        if axis_name is not None:
            loss = jax.lax.pmean(loss, axis_name)
        return loss

    return loss_fn


def grad_check_fd(f, x, eps: float = 1e-3, atol: float = 1e-3, rtol: float = 0.15):
    """Compare analytic grad of scalar f at x (flat array) vs central FD.

    Returns (analytic, fd, ok_mask) — used by tests/test_grad.py for the
    BASELINE gradient-correctness criterion.
    """
    g = jax.grad(f)(x)
    g = jnp.asarray(g)
    fd = []
    import numpy as np
    xf = np.asarray(x, np.float64)
    for i in range(xf.size):
        d = np.zeros_like(xf)
        d.flat[i] = eps
        fp = float(f(jnp.asarray(xf + d, jnp.float32)))
        fm = float(f(jnp.asarray(xf - d, jnp.float32)))
        fd.append((fp - fm) / (2 * eps))
    fd = np.asarray(fd).reshape(xf.shape)
    ga = np.asarray(g, np.float64)
    ok = np.isclose(ga, fd, atol=atol, rtol=rtol)
    return ga, fd, ok
