"""Per-pixel debugger: the headless analogue of the reference editor's
Debugger tab (Core/UserInterface.cpp:141-236 — cursor-centred pixel grid +
"press F to DebugBreak a ray", Core/Renderer.cpp:49-52, :513-520).

Instead of breaking into a debugger, ``trace_pixel`` re-traces one pixel's
path through the REAL integrator with its debug tap enabled and returns a
human-readable per-bounce record; ``pixel_grid`` renders the neighbourhood
block the ImGui panel showed. Exposed on the CLI via --debug-pixel X Y.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from physically_based_ray_tracer_tpu.config import RenderConfig, RenderMode
from physically_based_ray_tracer_tpu.render.integrator import trace_paths
from physically_based_ray_tracer_tpu.scene.camera import Camera, primary_rays


def trace_pixel(scene, cam: Camera, cfg: RenderConfig, x: int, y: int,
                key=None, sample: int = 0) -> list[dict]:
    """Trace pixel (x, y)'s primary path; returns one dict per bounce with
    hit/material/lighting state (numpy scalars, printable)."""
    if key is None:
        key = jax.random.key(0)
    pixel_id = jnp.asarray([y * cfg.width + x], jnp.int32)
    xs = jnp.asarray([float(x)])
    ys = jnp.asarray([float(y)])
    o, d = primary_rays(cam, xs, ys, cfg.width, cfg.height,
                        panini=cfg.post_processed)
    radiance, _, dbg = trace_paths(scene, cfg, o, d, pixel_id, key, sample,
                                   collect_debug=True)
    out = []
    host = jax.tree.map(np.asarray, dbg)
    for b in range(cfg.bounces):
        rec = {k: v[b, 0] for k, v in host.items()}
        rec["bounce"] = b
        out.append(rec)
        if not rec["alive_out"] and rec["hit_prim"] < 0:
            break
    out.append({"radiance": np.asarray(radiance)[0]})
    return out


def format_trace(records: list[dict]) -> str:
    """Render trace_pixel output the way the reference printed its debugged
    ray — one line block per bounce."""
    lines = []
    for r in records:
        if "radiance" in r:
            lines.append(f"final radiance = {r['radiance']}")
            continue
        b = r["bounce"]
        if r["hit_prim"] < 0:
            lines.append(f"[bounce {b}] MISS  o={r['ray_o']} d={r['ray_d']}")
            continue
        lines.append(
            f"[bounce {b}] prim={int(r['hit_prim'])} inst={int(r['hit_inst'])}"
            f" t={r['hit_t']:.5f} uv=({r['hit_u']:.3f},{r['hit_v']:.3f})\n"
            f"    point={r['point']} shad_n={r['shad_n']}\n"
            f"    base={r['base_color']} metal={r['metalness']:.3f}"
            f" rough={r['roughness']:.3f}"
            f" dielectric={bool(r['is_dielectric'])}\n"
            f"    vertex_radiance={r['vertex_radiance']}"
            f" lobe={'SPEC' if r['picked_specular'] else 'DIFF'}"
            f" next_dir={r['next_dir']} alive={bool(r['alive_out'])}")
    return "\n".join(lines)


def pixel_grid(scene, cam: Camera, cfg: RenderConfig, x: int, y: int,
               radius: int = 3, key=None, sample: int = 0) -> np.ndarray:
    """Render the (2*radius)^2 pixel block centred on (x, y) — the debugger
    tab's colour grid (Core/UserInterface.cpp:141-236). Returns
    (2r, 2r, 3) float colours."""
    from physically_based_ray_tracer_tpu.render.integrator import render_sample
    if key is None:
        key = jax.random.key(0)
    xs = np.clip(np.arange(x - radius, x + radius), 0, cfg.width - 1)
    ys = np.clip(np.arange(y - radius, y + radius), 0, cfg.height - 1)
    gx, gy = np.meshgrid(xs, ys)
    ids = jnp.asarray((gy * cfg.width + gx).reshape(-1).astype(np.int32))
    color, _ = render_sample(scene, cam, cfg, key, sample, ids)
    return np.asarray(color).reshape(2 * radius, 2 * radius, 3)
