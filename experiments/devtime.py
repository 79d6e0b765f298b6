"""Reliable device timing over the axon tunnel.

``jax.block_until_ready`` does not actually block on this platform (dispatch
is fire-and-forget over the relay), so wall-clock around a dispatch measures
nothing. The only reliable sync is a device->host fetch. This module times a
jitted fn with the *slope method*: run the op L times inside one jit via
``lax.fori_loop`` (so the device genuinely executes L iterations), fetch one
scalar, and difference two L values to cancel the fetch/dispatch constant.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch_scalar(x):
    """Device sync: transfer a scalar to host."""
    return float(np.asarray(x))


def time_iterated(make_loop, l_small=2, l_large=10):
    """make_loop(L) -> jitted zero-arg fn returning a scalar after L iters.
    Returns per-iteration seconds."""
    f_small = make_loop(l_small)
    f_large = make_loop(l_large)
    fetch_scalar(f_small())  # compile both + warm path
    fetch_scalar(f_large())
    t0 = time.perf_counter()
    s1 = fetch_scalar(f_small())
    t1 = time.perf_counter()
    s2 = fetch_scalar(f_large())
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (l_large - l_small)
    return dt


def loopify(step_fn, init_fn, L):
    """Build a jitted fn running step_fn L times over carried state."""
    @jax.jit
    def run():
        def body(i, c):
            return step_fn(c, i)
        c = jax.lax.fori_loop(0, L, body, init_fn())
        leaves = jax.tree.leaves(c)
        return sum(jnp.sum(l.astype(jnp.float32)) if l.dtype != bool
                   else jnp.sum(l) for l in leaves).astype(jnp.float32)
    return run
