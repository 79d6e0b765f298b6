"""Dense-leaf BVH for the Pallas traversal kernel.

TPU-native acceleration-structure design (replaces tinybvh's BVH8_CPU role,
Core/tiny_bvh.h:1183-1238, on this hardware). Where the reference packs
4-triangle leaves for 4-wide AVX Möller-Trumbore (BVHTri4Leaf,
Core/tiny_bvh.h:1136-1143), a TPU vreg is (8, 128): the natural dense unit is
a *128-triangle leaf group* stored component-major so one vector op tests
8 rays x 128 triangles. The tree is therefore shallow (fat leaves), its node
table small enough for SMEM (scalar memory) even at 10^5..10^6 triangles,
and all leaf data is loaded with aligned sublane slices — no per-lane
gathers anywhere.

Layouts:
  * ``nodes16`` (N*16,) f32 flat, per node:
      [c0min(3), c0max(3), c1min(3), c1max(3), child0, child1, pad, pad]
    children stored as *floats* (exact for |idx| < 2^24):
      >= 0 -> internal node index, < 0 -> leaf group id = -(c+1).
    An absent child slot has an inverted box (min=+BIG, max=-BIG): the slab
    test can never accept it, so no empty-child branch exists in the kernel.
  * ``groups`` (G*16, 128) f32: group g occupies rows [16g, 16g+16); rows
    0..8 are v0.xyz, e1.xyz, e2.xyz (one triangle per lane), row 9 is the
    original primitive id as float (-1 for padding lanes). Padding lanes are
    all-zero triangles -> Möller-Trumbore det == 0 -> never hit.

Variable-count leaves: a leaf holding k triangles is padded to the next
power of two c = 2^ceil(log2 k) (degenerate all-zero triangles) and that
c-block is replicated cyclically across all 128 lanes (slot j = tri j mod c).
Because c divides 128, after r roll-by-1 steps lane L holds slot
(L - r) mod 128, whose triangle is ((L - r) mod 128) mod c — over
r = 0..c-1 every lane sees every distinct triangle exactly once. The kernel
therefore sweeps only c iterations instead of LEAF_W. The leaf child pointer
encodes both: child = -(g * 8 + log2(c) + 1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

BINS = 8
LEAF_W = 128          # triangles per leaf group == TPU lane count
GROUP_ROWS = 16       # rows per group in the flat groups array (12 used)
NODE_F = 16           # floats per node in nodes16
BIG = np.float32(1e30)


class DenseBVH(NamedTuple):
    """Device-resident dense-leaf BVH (see module docstring for layouts)."""

    nodes16: jnp.ndarray   # (N*16,) f32
    groups: jnp.ndarray    # (G*16, 128) f32
    world_lo: jnp.ndarray  # (3,) f32 root bounds (for Morton ray sorting)
    world_hi: jnp.ndarray  # (3,) f32

    @property
    def n_nodes(self):
        return self.nodes16.shape[0] // NODE_F

    @property
    def n_groups(self):
        return self.groups.shape[0] // GROUP_ROWS


def _surface_area(bmin, bmax):
    e = np.maximum(bmax - bmin, 0.0)
    return 2.0 * (e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2]
                  + e[..., 2] * e[..., 0])


def build_dense(triangles: np.ndarray, leaf_target: int = 64,
                ) -> tuple["DenseBVH", int]:
    """Binned-SAH build (algorithm of Core/tiny_bvh.h:1841-1934) with fat
    dense leaves: a segment becomes a leaf group once ``count <= leaf_target``
    (leaf cost on this hardware is a *constant* per visit — one dense
    128-lane sweep — so classic per-triangle SAH leaf termination does not
    apply; fill fraction is the tunable).

    Returns (DenseBVH, depth).
    """
    tri = np.asarray(triangles, np.float32)
    if tri.ndim == 2:
        tri = tri.reshape(-1, 3, 3)
    T = tri.shape[0]
    leaf_target = min(leaf_target, LEAF_W)

    v0 = tri[:, 0]
    bmin = tri.min(axis=1)
    bmax = tri.max(axis=1)
    centroid = (bmin + bmax) * 0.5
    order = np.arange(T, dtype=np.int64)

    max_nodes = max(4 * (T // max(leaf_target // 4, 1) + 2), 8)
    nodes = np.zeros((max_nodes, NODE_F), np.float32)
    # absent children: inverted boxes reject in the slab test
    nodes[:, 0:3] = BIG
    nodes[:, 3:6] = -BIG
    nodes[:, 6:9] = BIG
    nodes[:, 9:12] = -BIG
    n_nodes = 1
    leaf_segments: list[np.ndarray] = []

    def seg_bounds(seg):
        return bmin[seg].min(axis=0), bmax[seg].max(axis=0)

    def make_leaf(parent, side, s, e):
        g = len(leaf_segments)
        seg = order[s:e].copy()
        leaf_segments.append(seg)
        log2c = max(int(np.ceil(np.log2(max(len(seg), 1)))), 0)
        nodes[parent, 12 + side] = float(-(g * 8 + log2c + 1))

    def choose_split(s, e):
        """Best binned-SAH split of order[s:e]; returns mid or None."""
        seg = order[s:e]
        c = centroid[seg]
        cmin = c.min(axis=0)
        cmax = c.max(axis=0)
        ext = cmax - cmin
        if not np.any(ext > 1e-12):
            return s + (e - s) // 2 if (e - s) > LEAF_W else None
        scale = np.where(ext > 1e-12, BINS * 0.9999 / np.where(ext > 0, ext, 1.0), 0.0)
        bin_id = np.clip(((c - cmin) * scale).astype(np.int32), 0, BINS - 1)
        best = (np.inf, -1, -1)
        for ax in range(3):
            if ext[ax] <= 1e-12:
                continue
            ids = bin_id[:, ax]
            counts = np.bincount(ids, minlength=BINS)
            bb_min = np.full((BINS, 3), np.inf, np.float32)
            bb_max = np.full((BINS, 3), -np.inf, np.float32)
            np.minimum.at(bb_min, ids, bmin[seg])
            np.maximum.at(bb_max, ids, bmax[seg])
            lmin = np.minimum.accumulate(bb_min, axis=0)
            lmax = np.maximum.accumulate(bb_max, axis=0)
            rmin = np.minimum.accumulate(bb_min[::-1], axis=0)[::-1]
            rmax = np.maximum.accumulate(bb_max[::-1], axis=0)[::-1]
            lcnt = np.cumsum(counts)
            rcnt = np.cumsum(counts[::-1])[::-1]
            la = _surface_area(lmin[:-1], lmax[:-1])
            ra = _surface_area(rmin[1:], rmax[1:])
            cost = la * lcnt[:-1] + ra * rcnt[1:]
            cost = np.where((lcnt[:-1] == 0) | (rcnt[1:] == 0), np.inf, cost)
            b = int(np.argmin(cost))
            if cost[b] < best[0]:
                best = (float(cost[b]), ax, b)
        if best[1] < 0:
            return s + (e - s) // 2 if (e - s) > LEAF_W else None
        ax, b = best[1], best[2]
        go_left = bin_id[:, ax] <= b
        left = seg[go_left]
        right = seg[~go_left]
        if len(left) == 0 or len(right) == 0:
            return s + (e - s) // 2
        order[s:s + len(left)] = left
        order[s + len(left):e] = right
        return s + len(left)

    def alloc():
        nonlocal n_nodes
        i = n_nodes
        n_nodes += 1
        return i

    depth_max = 1
    # stack entries: (start, end, parent, side, depth)
    stack = [(0, T, -1, -1, 1)]
    while stack:
        s, e, parent, side, dep = stack.pop()
        depth_max = max(depth_max, dep)
        if (e - s) <= leaf_target:
            if parent < 0:
                # single-leaf scene: synthesize an internal root
                lo, hi = seg_bounds(order[s:e])
                nodes[0, 0:3] = lo
                nodes[0, 3:6] = hi
                make_leaf(0, 0, s, e)
            else:
                make_leaf(parent, side, s, e)
            continue
        mid = choose_split(s, e)
        if mid is None or mid <= s or mid >= e:
            if parent < 0:
                lo, hi = seg_bounds(order[s:e])
                nodes[0, 0:3] = lo
                nodes[0, 3:6] = hi
                make_leaf(0, 0, s, e)
            else:
                make_leaf(parent, side, s, e)
            continue
        node = 0 if parent < 0 else alloc()
        if parent >= 0:
            nodes[parent, 12 + side] = float(node)
        lmin_, lmax_ = seg_bounds(order[s:mid])
        rmin_, rmax_ = seg_bounds(order[mid:e])
        nodes[node, 0:3] = lmin_
        nodes[node, 3:6] = lmax_
        nodes[node, 6:9] = rmin_
        nodes[node, 9:12] = rmax_
        stack.append((s, mid, node, 0, dep + 1))
        stack.append((mid, e, node, 1, dep + 1))

    # choose_split force-splits any segment over LEAF_W (median fallback on
    # degenerate distributions), so every leaf fits one group
    final_segments = leaf_segments
    assert all(len(s) <= LEAF_W for s in final_segments)
    G = max(len(final_segments), 1)
    groups = np.zeros((G * GROUP_ROWS, LEAF_W), np.float32)
    groups[9::GROUP_ROWS, :] = -1.0   # prim row default: padding
    for g, seg in enumerate(final_segments):
        k = len(seg)
        r = g * GROUP_ROWS
        c = 1 << max(int(np.ceil(np.log2(max(k, 1)))), 0)
        # cyclic replication with period c (c | 128): slot j = tri j mod c,
        # padding slots within the c-block are degenerate zero triangles
        data = np.zeros((10, c), np.float32)
        data[9, :] = -1.0
        p0 = v0[seg]
        data[0:3, :k] = p0.T
        data[3:6, :k] = (tri[seg, 1] - p0).T
        data[6:9, :k] = (tri[seg, 2] - p0).T
        data[9, :k] = seg.astype(np.float32)
        groups[r:r + 10, :] = np.tile(data, (1, LEAF_W // c))

    root_lo = np.minimum(nodes[0, 0:3], np.where(nodes[0, 6:9] >= BIG,
                                                 nodes[0, 0:3], nodes[0, 6:9]))
    root_hi = np.maximum(nodes[0, 3:6], np.where(nodes[0, 9:12] <= -BIG,
                                                 nodes[0, 3:6], nodes[0, 9:12]))

    dbvh = DenseBVH(
        nodes16=jnp.asarray(nodes[:n_nodes].reshape(-1)),
        groups=jnp.asarray(groups),
        world_lo=jnp.asarray(root_lo),
        world_hi=jnp.asarray(root_hi),
    )
    return dbvh, depth_max
