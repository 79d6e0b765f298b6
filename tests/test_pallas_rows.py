"""Row-parallel megakernel (ops/pallas_rows.py) equivalence tests.

The row kernel must be lane-exact against the shared-stack kernel
(ops/pallas_trace.py): same slab tests, same Möller-Trumbore, same ordered
descent per sub-tile — only the scheduling differs.
"""

import numpy as np
import pytest

from physically_based_ray_tracer_tpu.bvh.dense import (build_dense,
                                                       build_dense_tlas)
from physically_based_ray_tracer_tpu.ops.pallas_rows import (rows_any_dense,
                                                             rows_closest_dense,
                                                             sorted_rows_closest)
from physically_based_ray_tracer_tpu.ops.pallas_trace import (
    intersect_any_dense, intersect_closest_dense)


@pytest.fixture(scope="module")
def soup():
    rng = np.random.default_rng(3)
    tri = rng.uniform(-1, 1, (400, 3, 3)).astype(np.float32)
    B = 2048
    o = rng.uniform(-2, 2, (B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return tri, o, d


def test_rows_closest_single_level(soup):
    tri, o, d = soup
    dbvh, _ = build_dense(tri, leaf_target=16)
    h0 = intersect_closest_dense(dbvh, o, d, interpret=True)
    h1 = rows_closest_dense(dbvh, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(h0.prim), np.asarray(h1.prim))
    np.testing.assert_allclose(np.asarray(h0.t), np.asarray(h1.t), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(h0.inst), np.asarray(h1.inst))


def test_rows_any_single_level(soup):
    tri, o, d = soup
    dbvh, _ = build_dense(tri, leaf_target=16)
    tm = np.full(o.shape[0], 1.5, np.float32)
    a0 = intersect_any_dense(dbvh, o, d, tm, interpret=True)
    a1 = rows_any_dense(dbvh, o, d, tm, interpret=True)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))


def test_rows_two_level(soup):
    tri, o, d = soup
    tfs = np.stack([np.eye(4, dtype=np.float32)] * 3)
    tfs[1][:3, 3] = [3, 0.5, 0]
    tfs[2][:3, 3] = [-3, 0, 1]
    tfs[2][:3, :3] *= 0.7
    dbvh, meta, _ = build_dense_tlas([tri, tri[:100]], [0, 1, 0], tfs,
                                     leaf_target=16)
    h0 = intersect_closest_dense(dbvh, o, d, interpret=True)
    h1 = rows_closest_dense(dbvh, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(h0.prim), np.asarray(h1.prim))
    np.testing.assert_array_equal(np.asarray(h0.inst), np.asarray(h1.inst))
    np.testing.assert_allclose(np.asarray(h0.t), np.asarray(h1.t), rtol=1e-6)
    tm = np.full(o.shape[0], 2.0, np.float32)
    a0 = intersect_any_dense(dbvh, o, d, tm, interpret=True)
    a1 = rows_any_dense(dbvh, o, d, tm, interpret=True)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))


def test_rows_sorted_wrapper(soup):
    tri, o, d = soup
    dbvh, _ = build_dense(tri, leaf_target=16)
    h0 = intersect_closest_dense(dbvh, o, d, interpret=True)
    h1 = sorted_rows_closest(dbvh, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(h0.prim), np.asarray(h1.prim))
