"""Optimizer checkpoint round-trip (diff/checkpoint.py)."""

import jax.numpy as jnp
import numpy as np
import optax

from physically_based_ray_tracer_tpu.diff.checkpoint import (load_checkpoint,
                                                             save_checkpoint)


def test_checkpoint_roundtrip(tmp_path):
    params = {"base_color": jnp.asarray([[0.1, 0.2, 0.3]]),
              "roughness": jnp.asarray([0.5])}
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    path = save_checkpoint(str(tmp_path / "ckpt"), params, opt_state, step=7)
    p2, os2, step = load_checkpoint(path, params, opt_state)
    assert step == 7
    np.testing.assert_allclose(np.asarray(p2["base_color"]),
                               np.asarray(params["base_color"]))
    l1 = jnp.asarray(0.0)  # structural comparison of opt state
    import jax
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(os2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
