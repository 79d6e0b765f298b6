"""Dense-leaf BVH (+ two-level TLAS) for the Pallas traversal kernel.

TPU-native acceleration-structure design (replaces tinybvh's BVH8_CPU +
TLAS roles, Core/tiny_bvh.h:1183-1238, :1732-1770, on this hardware). Where
the reference packs 4-triangle leaves for 4-wide AVX Möller-Trumbore
(BVHTri4Leaf, Core/tiny_bvh.h:1136-1143), a TPU vreg is (8, 128): the
natural dense unit is a *128-triangle leaf group* stored component-major so
one vector op tests 8 rays x 128 triangles. The tree is therefore shallow
(fat leaves), its node table small enough for SMEM (scalar memory) even at
10^5..10^6 triangles, and all leaf data is loaded with aligned sublane
slices — no per-lane gathers anywhere.

Layouts:
  * ``nodes16`` (N*16,) f32 flat, per node:
      [c0min(3), c0max(3), c1min(3), c1max(3), child0, child1, pad, pad]
    children stored as *floats* (exact for |idx| < 2^24):
      code >= 0            -> internal node index
      code <  0, v=-(code+1):
        v & 1 == 0         -> triangle leaf, v >> 1 = group*8 + log2(period)
        v & 1 == 1         -> instance leaf, v >> 1 = instance id
                              (id RESTORE_ID is the kernel's ray-space
                              restore sentinel; never a real instance)
      code == ABSENT       -> no child in this slot (kernel rejects by
                              code — see ABSENT note below).
  * ``groups`` (G*16, 128) f32: group g occupies rows [16g, 16g+16); rows
    0..8 are v0.xyz, e1.xyz, e2.xyz (one triangle per lane), row 9 is the
    primitive id as float (-1 for padding lanes). Padding lanes are
    all-zero triangles -> Möller-Trumbore det == 0 -> never hit.
  * ``inst16`` (I*16,) f32, per instance (BLASInstance analogue,
    Core/tiny_bvh.h:1243-1256): [0:12] = rows of the inverse (object from
    world) 3x4 transform, [12] = BLAS root node index, [13:16] pad.
  * ``prim_base`` (max(I,1),) i32: per-instance offset added to the
    mesh-local primitive ids baked in shared BLAS groups, mapping hits to
    the scene's global (per-instance-concatenated) primitive order.

Variable-count leaves: a leaf holding k triangles is padded to the next
power of two c = 2^ceil(log2 k) (degenerate all-zero triangles) and that
c-block is replicated cyclically across all 128 lanes (slot j = tri j mod
c). Because c divides 128, after r roll-by-1 steps lane L holds slot
(L - r) mod 128, whose triangle is ((L - r) mod 128) mod c — over
r = 0..c-1 every lane sees every distinct triangle exactly once. The kernel
therefore sweeps only c iterations instead of LEAF_W; log2(c) rides in the
leaf code.

Two-level build (build_dense_tlas): each mesh's BLAS is built once; the
TLAS is a small sweep-SAH BVH2 over instance world AABBs whose leaves are
instance codes. All tables merge into one node/group table (BLAS node ids
shifted past a fixed-capacity TLAS head region), so the kernel needs no
separate dispatch — entering an instance just jumps to its BLAS root with
the ray re-based into object space. refresh_tlas() rewrites only the TLAS
head + inst16 when transforms change (the analogue of per-frame
Scene::BuildTLAS, Core/Scene.cpp:220-223) — BLAS nodes and the (big) group
table stay resident on device untouched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

BINS = 8
LEAF_W = 128          # triangles per leaf group == TPU lane count
GROUP_ROWS = 16       # rows per group in the flat groups array (12 used)
NODE_F = 16           # floats per node in nodes16
INST_F = 16           # floats per instance in inst16
RESTORE_ID = (1 << 22) - 1   # reserved instance id: ray-space restore pop
ABSENT = -(1 << 30)          # child code of an absent slot (exact in f32).
# NOTE: absent slots need an explicit code check in the kernel — the min/max
# slab test is symmetric in lo/hi, so an "inverted box" would ACCEPT every
# ray (both per-axis planes just swap), not reject it.
BIG = np.float32(1e30)


def _tri_code(g: int, log2c: int) -> float:
    return float(-(2 * (g * 8 + log2c) + 1))


def _inst_code(iid: int) -> float:
    return float(-(2 * iid + 2))


class DenseBVH(NamedTuple):
    """Device-resident dense-leaf BVH (see module docstring for layouts)."""

    nodes16: jnp.ndarray    # (N*16,) f32
    groups: jnp.ndarray     # (G*16, 128) f32
    inst16: jnp.ndarray     # (I*16,) f32 (one zero row when single-level)
    prim_base: jnp.ndarray  # (max(I,1),) i32 global prim offset per instance
    world_lo: jnp.ndarray   # (3,) f32 root bounds (for Morton ray sorting)
    world_hi: jnp.ndarray   # (3,) f32
    # bf16 banded leaf storage for the bf16-sweep megakernel
    # (ops/pallas_bf16.py): group g occupies rows [32g, 32g+32); row
    # 2*i + b = component i (v0-glo, e1, e2 — LOCAL to the group origin so
    # bf16's 8-bit mantissa applies to leaf-local coordinates, not scene
    # coordinates) pre-rolled right by (b*c)//2 lanes (band b of 2).
    groups_bf: jnp.ndarray | None = None   # (G*32, 128) bf16
    glo: jnp.ndarray | None = None         # (G*8,) f32 group AABB per group:
    #                                        [lo.xyz, 0, hi.xyz, 0] (SMEM)
    # compact winner-decode table: the c <= C distinct mesh-local prim ids
    # of group g at [g*C, g*C + c), padded with -1. The fast decode gathers
    # from this (G*C,) array instead of the (G*16, 128) groups table — the
    # XLA scalar gather that dominates the bf16 decode costs ~2.5x less
    # from the small table (profiles/frame_r05_bf16, ~2.3 ms/call before).
    pids_c: jnp.ndarray | None = None      # (G*C,) f32, C = max group period

    @property
    def n_nodes(self):
        return self.nodes16.shape[0] // NODE_F

    @property
    def n_groups(self):
        return self.groups.shape[0] // GROUP_ROWS

    @property
    def n_instances(self):
        return self.inst16.shape[0] // INST_F


class TLASMeta(NamedTuple):
    """Host-side constants needed to refresh the TLAS without touching
    BLAS/group data (instance count and mesh assignment are fixed)."""

    tlas_cap: int          # nodes reserved for the TLAS at the table head
    inst_mesh: np.ndarray  # (I,) mesh index per instance
    blas_root: np.ndarray  # (B,) merged-table root node index per mesh
    blas_lo: np.ndarray    # (B, 3) object-space root bounds per mesh
    blas_hi: np.ndarray    # (B, 3)


def _surface_area(bmin, bmax):
    e = np.maximum(bmax - bmin, 0.0)
    return 2.0 * (e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2]
                  + e[..., 2] * e[..., 0])


def _build_core(tri: np.ndarray, leaf_target: int):
    """Binned-SAH build (algorithm of Core/tiny_bvh.h:1841-1934) with fat
    dense leaves: a segment becomes a leaf group once count <= leaf_target
    (leaf cost on this hardware is a constant per visit — one dense sweep —
    so classic per-triangle SAH leaf termination does not apply; fill
    fraction is the tunable).

    Returns (nodes (n,16) np, leaf_segments, depth, root_lo, root_hi).
    """
    T = tri.shape[0]
    leaf_target = min(leaf_target, LEAF_W)

    bmin = tri.min(axis=1)
    bmax = tri.max(axis=1)
    centroid = (bmin + bmax) * 0.5
    order = np.arange(T, dtype=np.int64)

    max_nodes = max(4 * (T // max(leaf_target // 4, 1) + 2), 8)
    nodes = np.zeros((max_nodes, NODE_F), np.float32)
    nodes[:, 12:14] = ABSENT
    n_nodes = 1
    leaf_segments: list[np.ndarray] = []

    def seg_bounds(seg):
        return bmin[seg].min(axis=0), bmax[seg].max(axis=0)

    def make_leaf(parent, side, s, e):
        g = len(leaf_segments)
        seg = order[s:e].copy()
        leaf_segments.append(seg)
        log2c = max(int(np.ceil(np.log2(max(len(seg), 1)))), 0)
        nodes[parent, 12 + side] = _tri_code(g, log2c)

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
    assert all(len(s) <= LEAF_W for s in leaf_segments)
    if int(np.rint(nodes[0, 13])) == ABSENT:      # single-leaf root
        root_lo, root_hi = nodes[0, 0:3].copy(), nodes[0, 3:6].copy()
    else:
        root_lo = np.minimum(nodes[0, 0:3], nodes[0, 6:9])
        root_hi = np.maximum(nodes[0, 3:6], nodes[0, 9:12])
    return nodes[:n_nodes], leaf_segments, depth_max, root_lo, root_hi


def _build_core_hq(tri: np.ndarray, leaf_target: int):
    """SBVH build of the dense-leaf tree via the native spatial-split
    builder (csrc/sbvh_builder.cpp, BuildHQ analogue) — same return
    contract as _build_core. Returns None when the native toolchain is
    unavailable (callers fall back to the binned-SAH numpy core)."""
    from physically_based_ray_tracer_tpu.bvh import native

    out = native.build_sbvh_generic(tri, min(leaf_target, LEAF_W),
                                    dense_mode=True)
    if out is None:
        return None
    nodes_box, children, segments = out
    N = nodes_box.shape[0]
    INT32_MIN = np.iinfo(np.int32).min

    nodes = np.zeros((N, NODE_F), np.float32)
    nodes[:, 0:12] = nodes_box
    for n in range(N):
        for side in range(2):
            c = int(children[n, side])
            if c >= 0:
                nodes[n, 12 + side] = float(c)
            elif c == INT32_MIN:
                nodes[n, 12 + side] = ABSENT
            else:
                s = -(c + 1)
                log2c = max(int(np.ceil(np.log2(max(len(segments[s]), 1)))), 0)
                nodes[n, 12 + side] = _tri_code(s, log2c)

    # depth + root bounds by walking the tree
    depth = 1
    stack = [(0, 1)]
    while stack:
        n, d = stack.pop()
        depth = max(depth, d)
        for side in range(2):
            c = int(children[n, side])
            if c >= 0:
                stack.append((c, d + 1))
    if int(children[0, 1]) == INT32_MIN:   # single-leaf root
        root_lo, root_hi = nodes[0, 0:3].copy(), nodes[0, 3:6].copy()
    else:
        root_lo = np.minimum(nodes[0, 0:3], nodes[0, 6:9])
        root_hi = np.maximum(nodes[0, 3:6], nodes[0, 9:12])
    return nodes, segments, depth, root_lo, root_hi


def _pack_groups(tri: np.ndarray, segments: list[np.ndarray]) -> np.ndarray:
    """Component-major leaf groups with cyclic power-of-two replication."""
    v0 = tri[:, 0]
    G = max(len(segments), 1)
    groups = np.zeros((G * GROUP_ROWS, LEAF_W), np.float32)
    groups[9::GROUP_ROWS, :] = -1.0   # prim row default: padding
    for g, seg in enumerate(segments):
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
    return groups


# single-level stub: shorter than one INST_F row, so the traversal kernel
# statically strips all instance machinery (ops/pallas_trace.py two_level)
_NO_INST = np.zeros((1,), np.float32)

# bf16 banded-group constants (ops/pallas_bf16.py): 9 geometry components
# x 2 bands (band 1 = band 0 pre-rolled by c/2), padded to 32 rows = 2
# native (16,128) bf16 tiles so dynamic-offset HBM DMAs stay tile-aligned.
# p=2 @ 1024-ray tiles keeps the proven f32 node/TLAS phase intact; wider
# bands at narrower tiles LOSE on instanced scenes (each small tile
# re-enters every overlapping instance's BLAS — measured 14x regression,
# docs/BF16_VS_F32_r04.json history).
BF_BANDS = 2
BF_ROWS = 32


def _group_period(pid_row: np.ndarray) -> int:
    """Replication period c of one group's prim-id row (c | 128)."""
    for c in (1, 2, 4, 8, 16, 32, 64, 128):
        if np.array_equal(pid_row, np.tile(pid_row[:c], 128 // c)):
            return c
    return 128


def _pack_groups_bf(groups: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Derive the banded bf16 leaf table + per-group origins from the f32
    component-major groups array (works for fresh builds AND refits — the
    period c is recovered from the prim-id row's replication pattern).

    Band b of component i sits at row BF_BANDS*i + b, pre-rolled right by
    (b*c)//BF_BANDS lanes: at sweep iteration k, ray lane l in band b
    tests original lane (l - k - (b*c)//BF_BANDS) mod 128 — over
    k = 0..max(c/BF_BANDS,1)-1 the bands cover every distinct triangle of
    the group exactly (duplicates when c < BF_BANDS are harmless).
    """
    G = groups.shape[0] // GROUP_ROWS
    gview = groups.reshape(G, GROUP_ROWS, LEAF_W)
    pidrow = gview[:, 9, :]                               # (G, 128)
    # replication period per group: smallest c with row == tile(row[:c])
    # (vectorized across groups — the scalar per-group loop was a visible
    # build/refit cost at 1M-triangle scale, ADVICE r4)
    c_arr = np.full(G, LEAF_W, np.int64)
    for c in (64, 32, 16, 8, 4, 2, 1):
        eq = np.all(pidrow == np.tile(pidrow[:, :c], (1, LEAF_W // c)),
                    axis=1)
        c_arr[eq] = c
    comps = gview[:, 0:9, :].copy()                       # (G, 9, 128)
    v0 = comps[:, 0:3, :]
    corners = np.concatenate(
        [v0, v0 + comps[:, 3:6, :], v0 + comps[:, 6:9, :]], axis=2)
    live3 = np.tile(pidrow >= 0, (1, 3))[:, None, :]      # (G, 1, 384)
    lo = np.where(live3, corners, np.inf).min(axis=2)     # (G, 3)
    hi = np.where(live3, corners, -np.inf).max(axis=2)
    any_live = (pidrow >= 0).any(axis=1)[:, None]
    lo = np.where(any_live, lo, 0.0).astype(np.float32)
    hi = np.where(any_live, hi, 0.0).astype(np.float32)
    glo = np.zeros((G, 8), np.float32)     # [lo3, 0, hi3, 0] per group
    glo[:, 0:3] = lo
    glo[:, 4:7] = hi
    comps[:, 0:3, :] -= lo[:, :, None]                    # local v0
    out = np.zeros((G, BF_ROWS, LEAF_W), np.float32)
    lanes = np.arange(LEAF_W)
    for b in range(BF_BANDS):
        shift = (b * c_arr) // BF_BANDS                   # (G,)
        src = (lanes[None, None, :] - shift[:, None, None]) % LEAF_W
        out[:, BF_BANDS * np.arange(9) + b, :] = np.take_along_axis(
            comps, np.broadcast_to(src, comps.shape), axis=2)
    out_bf = out.reshape(G * BF_ROWS, LEAF_W).astype(jnp.bfloat16)
    # compact winner-decode table: the first c slots of pidrow are the
    # group's distinct prims (the row is c-periodic); pad to the scene-wide
    # max period C with -1 (see DenseBVH.pids_c)
    C = int(c_arr.max()) if G else 1
    pids_c = np.where(np.arange(C)[None, :] < c_arr[:, None],
                      pidrow[:, :C], -1.0).astype(np.float32)
    return out_bf, glo.reshape(-1), pids_c.reshape(-1)


# ---------------------------------------------------------------------------
# Leaf shaping: the CombineLeafs/SplitLeafs + reinsertion-Optimize analogue
# (tinybvh Core/tiny_bvh.h:2353, :1542, :2286, used at :4479-4487) driven by
# THIS kernel's cost model instead of triangle counts: a leaf visit costs a
# fixed group-load overhead plus ceil_pow2(count) roll iterations
# (ops/pallas_trace.py leaf_visit), and a node step costs ~C_NODE roll
# units (two (8,128) slab tests + scalar control). Children are visited
# with probability ~ SA(child)/SA(parent) (the SAH surface-area measure).
# ---------------------------------------------------------------------------

C_NODE = 1.5    # node step cost, in leaf-roll-iteration units
C_LEAF = 3.0    # fixed per-leaf-visit overhead (group slice load + setup)


def _pow2(k: int) -> int:
    return 1 << max(int(np.ceil(np.log2(max(k, 1)))), 0)


def _sa(lo, hi):
    e = np.maximum(hi - lo, 0.0)
    return float(2.0 * (e[0] * e[1] + e[1] * e[2] + e[2] * e[0]))


def dense_sweep_cost(nodes: np.ndarray, segments: list[np.ndarray],
                     bmin: np.ndarray, bmax: np.ndarray) -> float:
    """Expected roll-units per root-entering tile under the SAH area
    measure — the diagnostic tinybvh's SAHCost (:1532) plays, for the dense
    cost model. ``bmin``/``bmax`` are accepted for signature stability but
    the walk derives every box it needs from the node table itself."""
    del bmin, bmax
    root_lo = np.minimum(nodes[0, 0:3], nodes[0, 6:9])
    root_hi = np.maximum(nodes[0, 3:6], nodes[0, 9:12])
    return _cost_walk(nodes, segments, _sa(root_lo, root_hi))


def _cost_walk(nodes, segments, area_root):
    """Σ over nodes/leaves of P(visit) * step cost (classic SAH form with
    the dense leaf cost). Iterative — no recursion-limit games."""
    total = 0.0
    stack = [(0, None)]
    while stack:
        i, box = stack.pop()
        if box is None:
            lo = np.minimum(nodes[i, 0:3], nodes[i, 6:9])
            hi = np.maximum(nodes[i, 3:6], nodes[i, 9:12])
        else:
            lo, hi = box
        total += C_NODE * _sa(lo, hi) / area_root
        for side in range(2):
            code = int(np.rint(nodes[i, 12 + side]))
            if code == ABSENT:
                continue
            clo = nodes[i, 6 * side:6 * side + 3]
            chi = nodes[i, 6 * side + 3:6 * side + 6]
            if code >= 0:
                stack.append((code, (clo, chi)))
            else:
                v = -(code + 1)
                if v % 2 == 1:
                    continue   # instance leaf: costed in its BLAS
                g = (v // 2) // 8
                total += (_sa(clo, chi) / area_root
                          * (C_LEAF + _pow2(len(segments[g]))))
    return total


def shape_dense_leaves(tri: np.ndarray, nodes: np.ndarray,
                       segments: list[np.ndarray], min_leaf: int = 24,
                       hysteresis: float = 0.9,
                       ) -> tuple[np.ndarray, list[np.ndarray]]:
    """Cost-driven leaf merge/split post-pass (CombineLeafs/SplitLeafs
    analogue). Exact: traversal results are unchanged for any tree shape;
    only the expected sweep cost moves.

    * merge: an internal node whose children are both triangle leaves is
      collapsed when  C_LEAF + pow2(a+b) < C_NODE + Pa*(C_LEAF + pow2(a))
      + Pb*(C_LEAF + pow2(b))  (pow2 padding often makes the union free);
    * split: a leaf is split by the SAH axis median when two children are
      expected to cost ``hysteresis``-fraction less than its padded sweep,
      and never below ``min_leaf`` triangles (group memory is constant per
      leaf, so over-splitting trades sweep time for footprint).
    """
    bmin = tri.min(axis=1)
    bmax = tri.max(axis=1)

    def seg_bounds(seg):
        return bmin[seg].min(axis=0), bmax[seg].max(axis=0)

    # --- decode to a little tree of dicts ---------------------------------
    def decode(i):
        node = {"kind": "node"}
        for side in range(2):
            code = int(np.rint(nodes[i, 12 + side]))
            if code == ABSENT:
                node[f"c{side}"] = None
            elif code >= 0:
                node[f"c{side}"] = decode(code)
            else:
                v = -(code + 1)
                if v % 2 == 1:
                    node[f"c{side}"] = {"kind": "inst", "iid": v // 2}
                else:
                    g = (v // 2) // 8
                    node[f"c{side}"] = {"kind": "leaf",
                                        "seg": segments[g].copy()}
        return node

    import sys
    sys.setrecursionlimit(100000)
    root = decode(0)

    # --- merge pass (bottom-up) -------------------------------------------
    def merge(nd):
        if nd is None or nd["kind"] != "node":
            return nd
        nd["c0"] = merge(nd["c0"])
        nd["c1"] = merge(nd["c1"])
        a, b = nd["c0"], nd["c1"]
        if (a is not None and b is not None
                and a["kind"] == "leaf" and b["kind"] == "leaf"
                and len(a["seg"]) + len(b["seg"]) <= LEAF_W):
            la, ha = seg_bounds(a["seg"])
            lb, hb = seg_bounds(b["seg"])
            lu = np.minimum(la, lb)
            hu = np.maximum(ha, hb)
            sa_u = max(_sa(lu, hu), 1e-30)
            pa = min(_sa(la, ha) / sa_u, 1.0)
            pb = min(_sa(lb, hb) / sa_u, 1.0)
            cost_split = (C_NODE + pa * (C_LEAF + _pow2(len(a["seg"])))
                          + pb * (C_LEAF + _pow2(len(b["seg"]))))
            cost_merged = C_LEAF + _pow2(len(a["seg"]) + len(b["seg"]))
            if cost_merged < cost_split:
                return {"kind": "leaf",
                        "seg": np.concatenate([a["seg"], b["seg"]])}
        return nd

    root = merge(root)

    # --- split pass (top-down, recursive on new leaves) --------------------
    def try_split(leaf):
        seg = leaf["seg"]
        k = len(seg)
        # min_leaf floor: every group costs a fixed 8 KB regardless of
        # count, so tiny leaves trade a little sweep time for a huge
        # VMEM/HBM footprint (and fall out of the VMEM group budget)
        if k < 2 * min_leaf:
            return leaf
        lo, hi = seg_bounds(seg)
        c = centroid = (bmin[seg] + bmax[seg]) * 0.5
        ax = int(np.argmax(hi - lo))
        order = seg[np.argsort(centroid[:, ax], kind="stable")]
        m = k // 2
        a, b = order[:m], order[m:]
        la, ha = seg_bounds(a)
        lb, hb = seg_bounds(b)
        sa_u = max(_sa(lo, hi), 1e-30)
        pa = min(_sa(la, ha) / sa_u, 1.0)
        pb = min(_sa(lb, hb) / sa_u, 1.0)
        cost_split = (C_NODE + pa * (C_LEAF + _pow2(len(a)))
                      + pb * (C_LEAF + _pow2(len(b))))
        if cost_split < hysteresis * (C_LEAF + _pow2(k)):
            return {"kind": "node",
                    "c0": try_split({"kind": "leaf", "seg": a}),
                    "c1": try_split({"kind": "leaf", "seg": b})}
        return leaf

    def split_all(nd):
        if nd is None:
            return None
        if nd["kind"] == "leaf":
            return try_split(nd)
        if nd["kind"] == "node":
            nd["c0"] = split_all(nd["c0"])
            nd["c1"] = split_all(nd["c1"])
        return nd

    root = split_all(root)

    # --- re-emit node array + segments -------------------------------------
    new_segments: list[np.ndarray] = []
    out_nodes: list[np.ndarray] = []

    def subtree_bounds(nd):
        if nd["kind"] == "leaf":
            return seg_bounds(nd["seg"])
        if nd["kind"] == "inst":
            raise AssertionError("shape_dense_leaves runs on single BLAS trees")
        los, his = [], []
        for side in range(2):
            ch = nd[f"c{side}"]
            if ch is not None:
                lo, hi = subtree_bounds(ch)
                los.append(lo)
                his.append(hi)
        return np.min(los, axis=0), np.max(his, axis=0)

    def emit(nd):
        """Returns the child code for nd, emitting nodes as needed."""
        if nd["kind"] == "leaf":
            g = len(new_segments)
            new_segments.append(nd["seg"])
            log2c = max(int(np.ceil(np.log2(max(len(nd["seg"]), 1)))), 0)
            return _tri_code(g, log2c)
        idx = len(out_nodes)
        row = np.zeros(NODE_F, np.float32)
        row[12:14] = ABSENT
        out_nodes.append(row)
        for side in range(2):
            ch = nd[f"c{side}"]
            if ch is None:
                continue
            lo, hi = subtree_bounds(ch)
            row[6 * side:6 * side + 3] = lo
            row[6 * side + 3:6 * side + 6] = hi
            row[12 + side] = emit(ch)
        return float(idx)

    if root["kind"] == "leaf":
        # everything merged: synthesize an internal root (kernel enters at 0)
        lo, hi = seg_bounds(root["seg"])
        row = np.zeros(NODE_F, np.float32)
        row[0:3] = lo
        row[3:6] = hi
        row[12:14] = ABSENT
        out_nodes.append(row)
        g = len(new_segments)
        new_segments.append(root["seg"])
        log2c = max(int(np.ceil(np.log2(max(len(root["seg"]), 1)))), 0)
        row[12] = _tri_code(g, log2c)
    else:
        emit(root)
    return np.stack(out_nodes), new_segments


def _build_core_any(tri: np.ndarray, leaf_target: int, hq: bool,
                    shape: bool = False):
    if hq:
        out = _build_core_hq(tri, leaf_target)
        if out is None:
            out = _build_core(tri, leaf_target)
    else:
        out = _build_core(tri, leaf_target)
    if shape:
        nodes, segments, depth, lo, hi = out
        nodes, segments = shape_dense_leaves(tri, nodes, segments)
        # depth can only shrink on merge / grow by split levels; recompute
        depth = _tree_depth(nodes)
        out = (nodes, segments, depth, lo, hi)
    return out


def _tree_depth(nodes: np.ndarray) -> int:
    depth = 1
    stack = [(0, 1)]
    while stack:
        n, d = stack.pop()
        depth = max(depth, d)
        for side in range(2):
            c = int(np.rint(nodes[n, 12 + side]))
            if c >= 0:
                stack.append((c, d + 1))
    return depth


def build_dense(triangles: np.ndarray, leaf_target: int = 64,
                hq: bool = False, shape: bool = False) -> tuple["DenseBVH", int]:
    """Single-level build over one triangle soup (prim ids global).

    hq=True uses the native SBVH core (spatial splits, BuildHQ analogue)
    when the toolchain is available. shape=True runs the cost-driven leaf
    merge/split post-pass (shape_dense_leaves). Returns (DenseBVH, depth).
    """
    tri = np.asarray(triangles, np.float32)
    if tri.ndim == 2:
        tri = tri.reshape(-1, 3, 3)
    nodes, segments, depth, root_lo, root_hi = _build_core_any(
        tri, leaf_target, hq, shape)
    groups = _pack_groups(tri, segments)
    gbf, glo, pids_c = _pack_groups_bf(groups)
    dbvh = DenseBVH(
        nodes16=jnp.asarray(nodes.reshape(-1)),
        groups=jnp.asarray(groups),
        inst16=jnp.asarray(_NO_INST),
        prim_base=jnp.zeros((1,), jnp.int32),
        world_lo=jnp.asarray(root_lo),
        world_hi=jnp.asarray(root_hi),
        groups_bf=jnp.asarray(gbf),
        glo=jnp.asarray(glo),
        pids_c=jnp.asarray(pids_c),
    )
    return dbvh, depth


# ---------------------------------------------------------------------------
# Two-level (TLAS) build
# ---------------------------------------------------------------------------

def _instance_aabbs(meta_lo, meta_hi, inst_mesh, transforms):
    """World AABB per instance: transform the 8 corners of the BLAS root
    bounds (BLASInstance::Update, Core/tiny_bvh.h:7868-7881)."""
    I = len(inst_mesh)
    lo = np.empty((I, 3), np.float32)
    hi = np.empty((I, 3), np.float32)
    for i, m in enumerate(inst_mesh):
        bl, bh = meta_lo[m], meta_hi[m]
        cs = np.array([[x, y, z] for x in (bl[0], bh[0])
                       for y in (bl[1], bh[1]) for z in (bl[2], bh[2])],
                      np.float32)
        w = cs @ transforms[i][:3, :3].T + transforms[i][:3, 3]
        lo[i] = w.min(axis=0)
        hi[i] = w.max(axis=0)
    return lo, hi


def _build_tlas_nodes(lo: np.ndarray, hi: np.ndarray, cap: int) -> np.ndarray:
    """Sweep-SAH BVH2 over instance AABBs; leaves are instance codes.
    Small input (tens of instances) — full per-axis sorted sweep, the
    quality end of what binned SAH approximates."""
    I = lo.shape[0]
    nodes = np.zeros((cap, NODE_F), np.float32)
    nodes[:, 12:14] = ABSENT
    cent = (lo + hi) * 0.5
    n_nodes = [1]

    def alloc():
        i = n_nodes[0]
        n_nodes[0] += 1
        return i

    def set_child(node, side, idx):
        part_lo = lo[idx].min(axis=0)
        part_hi = hi[idx].max(axis=0)
        nodes[node, 6 * side:6 * side + 3] = part_lo
        nodes[node, 6 * side + 3:6 * side + 6] = part_hi
        if len(idx) == 1:
            nodes[node, 12 + side] = _inst_code(int(idx[0]))
        else:
            c = alloc()
            nodes[node, 12 + side] = float(c)
            split(idx, c)

    def split(idx, node):
        best = None
        for ax in range(3):
            o = idx[np.argsort(cent[idx, ax], kind="stable")]
            lmin = np.minimum.accumulate(lo[o], axis=0)
            lmax = np.maximum.accumulate(hi[o], axis=0)
            rmin = np.minimum.accumulate(lo[o][::-1], axis=0)[::-1]
            rmax = np.maximum.accumulate(hi[o][::-1], axis=0)[::-1]
            k = np.arange(1, len(o))
            cost = (_surface_area(lmin[:-1], lmax[:-1]) * k
                    + _surface_area(rmin[1:], rmax[1:]) * (len(o) - k))
            b = int(np.argmin(cost))
            if best is None or cost[b] < best[0]:
                best = (float(cost[b]), o, b + 1)
        _, o, m = best
        set_child(node, 0, o[:m])
        set_child(node, 1, o[m:])

    if I == 1:
        set_child(0, 0, np.array([0]))
    else:
        split(np.arange(I), 0)
    assert n_nodes[0] <= cap
    return nodes


def _inst_rows(inst_mesh, transforms, blas_root):
    I = len(inst_mesh)
    inst16 = np.zeros((I, INST_F), np.float32)
    for i, m in enumerate(inst_mesh):
        inv = np.linalg.inv(np.asarray(transforms[i], np.float64))
        inst16[i, 0:12] = inv[:3, :4].astype(np.float32).reshape(-1)
        inst16[i, 12] = float(blas_root[m])
    return inst16


def build_dense_tlas(mesh_tris: list[np.ndarray], inst_mesh, transforms,
                     leaf_target: int = 64, hq: bool = False,
                     shape: bool = False,
                     ) -> tuple["DenseBVH", TLASMeta, int]:
    """Two-level build: one shared BLAS per mesh + TLAS over instances.

    mesh_tris: per-mesh (T, 3, 3) object-space triangles (each stored ONCE).
    inst_mesh: (I,) mesh index per instance.
    transforms: (I, 4, 4) world-from-object transforms.

    Group prim ids are mesh-local; prim_base maps (inst, local) -> the
    global per-instance-concatenated prim order used by SceneData.

    Returns (DenseBVH, TLASMeta, depth) where depth = TLAS + max BLAS depth
    (feeds the traversal stack bound; +1 for the restore sentinel).
    """
    inst_mesh = np.asarray(inst_mesh, np.int64)
    transforms = np.asarray(transforms, np.float32)
    I = len(inst_mesh)
    B = len(mesh_tris)
    tlas_cap = max(I - 1, 1)

    blas_nodes, blas_groups, blas_lo, blas_hi = [], [], [], []
    depth_blas = 1
    for tri in mesh_tris:
        tri = np.asarray(tri, np.float32)
        if tri.ndim == 2:
            tri = tri.reshape(-1, 3, 3)
        nodes, segments, dep, rlo, rhi = _build_core_any(tri, leaf_target, hq,
                                                         shape)
        blas_nodes.append(nodes)
        blas_groups.append(_pack_groups(tri, segments))
        blas_lo.append(rlo)
        blas_hi.append(rhi)
        depth_blas = max(depth_blas, dep)
    blas_lo = np.stack(blas_lo)
    blas_hi = np.stack(blas_hi)

    # merged-table offsets
    node_off = np.empty(B, np.int64)
    group_off = np.empty(B, np.int64)
    n = tlas_cap
    g = 0
    for b in range(B):
        node_off[b] = n
        group_off[b] = g
        n += blas_nodes[b].shape[0]
        g += blas_groups[b].shape[0] // GROUP_ROWS

    merged = []
    for b in range(B):
        nn = blas_nodes[b].copy()
        for k in (12, 13):
            col = np.rint(nn[:, k]).astype(np.int64)
            internal = col >= 0
            out = col.copy()
            out[internal] = col[internal] + node_off[b]
            leaf = (col < 0) & (col != ABSENT)  # BLAS leaves: all tri leaves
            v = -(col[leaf] + 1)
            g8l = v // 2                 # group*8 + log2(period)
            regrouped = (g8l // 8 + group_off[b]) * 8 + g8l % 8
            out[leaf] = -(2 * regrouped + 1)
            nn[:, k] = out.astype(np.float32)
        merged.append(nn)

    inst16 = _inst_rows(inst_mesh, transforms, node_off)
    lo, hi = _instance_aabbs(blas_lo, blas_hi, inst_mesh, transforms)
    tlas = _build_tlas_nodes(lo, hi, tlas_cap)

    all_nodes = np.concatenate([tlas] + merged, axis=0)
    all_groups = np.concatenate(blas_groups, axis=0)

    counts = np.array([mesh_tris[m].reshape(-1, 3, 3).shape[0]
                       if np.asarray(mesh_tris[m]).ndim == 3
                       else np.asarray(mesh_tris[m]).shape[0] // 3
                       for m in inst_mesh], np.int64)
    prim_base = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)

    meta = TLASMeta(tlas_cap=tlas_cap, inst_mesh=inst_mesh,
                    blas_root=node_off.copy(), blas_lo=blas_lo,
                    blas_hi=blas_hi)
    gbf, glo, pids_c = _pack_groups_bf(all_groups)
    dbvh = DenseBVH(
        nodes16=jnp.asarray(all_nodes.reshape(-1)),
        groups=jnp.asarray(all_groups),
        inst16=jnp.asarray(inst16.reshape(-1)),
        prim_base=jnp.asarray(prim_base),
        world_lo=jnp.asarray(lo.min(axis=0)),
        world_hi=jnp.asarray(hi.max(axis=0)),
        groups_bf=jnp.asarray(gbf),
        glo=jnp.asarray(glo),
        pids_c=jnp.asarray(pids_c),
    )
    # depth: TLAS chain worst case + blas depth + restore sentinel
    depth = tlas_cap.bit_length() + depth_blas + 2
    return dbvh, meta, depth


def refresh_tlas(dbvh: DenseBVH, meta: TLASMeta, transforms) -> DenseBVH:
    """Per-frame TLAS refresh after instance transform changes — rewrites
    only the TLAS head of the node table + the instance rows; BLAS nodes
    and leaf groups stay untouched on device (Scene::BuildTLAS analogue,
    Core/Scene.cpp:220-223 + BLASInstance::Update, tiny_bvh.h:7868)."""
    transforms = np.asarray(transforms, np.float32)
    lo, hi = _instance_aabbs(meta.blas_lo, meta.blas_hi, meta.inst_mesh,
                             transforms)
    tlas = _build_tlas_nodes(lo, hi, meta.tlas_cap)
    inst16 = _inst_rows(meta.inst_mesh, transforms, meta.blas_root)
    return dbvh._replace(
        nodes16=dbvh.nodes16.at[:meta.tlas_cap * NODE_F]
                            .set(jnp.asarray(tlas.reshape(-1))),
        inst16=jnp.asarray(inst16.reshape(-1)),
        world_lo=jnp.asarray(lo.min(axis=0)),
        world_hi=jnp.asarray(hi.max(axis=0)),
    )
