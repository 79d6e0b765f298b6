"""Checkpoint/resume for inverse-rendering optimization state.

The reference's persistence is its JSON asset files (SURVEY.md §5 —
scene/lights/camera rewritten on every UI edit; handled here by
scene/serialization.py). The optimizer-state analogue the reference lacks:
orbax checkpoints of (params, opt_state, step) for long inverse-rendering
runs on pods, with a numpy fallback when orbax is unavailable.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_checkpoint(path: str, params, opt_state, step: int):
    """Save optimization state. Uses orbax when available, else .npz."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(path, f"step_{step}"),
                   {"params": params, "opt_state": opt_state,
                    "step": np.asarray(step)},
                   force=True)
        ckptr.wait_until_finished()
        return os.path.join(path, f"step_{step}")
    except Exception:
        os.makedirs(path, exist_ok=True)
        flat, treedef = jax.tree.flatten((params, opt_state))
        np.savez(os.path.join(path, f"step_{step}.npz"),
                 step=step, n=len(flat),
                 **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})
        return os.path.join(path, f"step_{step}.npz")


def load_checkpoint(path: str, like_params, like_opt_state):
    """Restore (params, opt_state, step) from a checkpoint path.

    ``like_*`` provide the pytree structure/shapes for restoration.
    """
    if path.endswith(".npz"):
        data = np.load(path)
        flat = [data[f"leaf_{i}"] for i in range(int(data["n"]))]
        treedef = jax.tree.structure((like_params, like_opt_state))
        params, opt_state = jax.tree.unflatten(treedef, flat)
        return params, opt_state, int(data["step"])
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    target = {"params": like_params, "opt_state": like_opt_state,
              "step": np.asarray(0)}
    restored = ckptr.restore(path, target)
    return restored["params"], restored["opt_state"], int(restored["step"])
