"""Pallas dense-leaf kernel vs the XLA dense phase (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physically_based_ray_tracer_tpu.bvh.builder import build_bvh
from physically_based_ray_tracer_tpu.ops.pallas_mt import (PALLAS_AVAILABLE,
                                                           leaf_intersect_pallas)
from physically_based_ray_tracer_tpu.ops.traverse_packet import _leaf_decode, mt_dense


@pytest.mark.skipif(not PALLAS_AVAILABLE, reason="pallas unavailable")
def test_pallas_leaf_matches_xla_dense():
    rng = np.random.default_rng(0)
    c = rng.uniform(0, 1, (200, 1, 3))
    tri = (c + rng.uniform(-0.1, 0.1, (200, 3, 3))).astype(np.float32)
    bvh = build_bvh(tri, leaf_size=16)

    T, W, L, K = 4, 128, 3, 16
    o = rng.uniform(-0.2, 1.2, (T, W, 3)).astype(np.float32)
    d = rng.normal(size=(T, W, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = np.full((T, W), 1e30, np.float32)
    t0 = np.full((T, W), 1e30, np.float32)
    zero = np.zeros((T, W), np.float32)
    p0 = np.full((T, W), -1, np.int32)

    child = np.asarray(bvh.nodes_child)
    leaf_codes = np.asarray([int(x) for x in child[child < 0]
                             if ((-(int(x) + 1)) & 127) > 0])
    lb = np.full((T, L), -1, np.int32)
    nl = np.zeros((T,), np.int32)
    for i in range(T):
        k = rng.integers(1, L + 1)
        lb[i, :k] = rng.choice(leaf_codes, size=k, replace=False)
        nl[i] = k

    t2, u2, v2, p2 = leaf_intersect_pallas(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax),
        jnp.asarray(t0), jnp.asarray(zero), jnp.asarray(zero), jnp.asarray(p0),
        jnp.asarray(lb), jnp.asarray(nl), bvh.tris, leaf_size=K, interpret=True)

    # XLA reference (identical update order)
    t_r = jnp.asarray(t0); u_r = jnp.asarray(zero); v_r = jnp.asarray(zero)
    p_r = jnp.asarray(p0)
    for l in range(L):
        code = jnp.asarray(lb[:, l])
        has = l < jnp.asarray(nl)
        first, count = _leaf_decode(jnp.where(has, code, -1))
        slots = first[:, None] + jnp.arange(K)[None, :]
        rows = jnp.take(jnp.asarray(bvh.tris),
                        jnp.where(has[:, None], slots, 0), axis=0, mode="clip")
        kt, ku, kv, khit = mt_dense(jnp.asarray(o), jnp.asarray(d), rows,
                                    jnp.minimum(t_r, jnp.asarray(tmax)))
        valid = (jnp.arange(K)[None, None, :] < count[:, None, None]) \
            & has[:, None, None] & khit
        for k in range(K):
            take = valid[:, :, k] & (kt[:, :, k] < jnp.minimum(t_r, jnp.asarray(tmax)))
            t_r = jnp.where(take, kt[:, :, k], t_r)
            u_r = jnp.where(take, ku[:, :, k], u_r)
            v_r = jnp.where(take, kv[:, :, k], v_r)
            p_r = jnp.where(take, first[:, None] + k, p_r)

    np.testing.assert_allclose(np.asarray(t2), np.asarray(t_r), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(p_r))
    assert (np.asarray(p2) >= 0).any()
