"""Pallas TPU kernel: dense tile x leaf Möller-Trumbore intersection.

The wave traversal's dense leaf phase (ops/traverse_packet.py) as a
hand-written Mosaic kernel: per grid step, one ray tile (W rays, VMEM
-resident components, rays on the 128-lane axis) is tested against its
buffered leaf triangles, DMA'd HBM->VMEM by leaf code (scalar-prefetched so
the DMA address is known before the body runs) — the TPU-memory-hierarchy
rebuild of tinybvh's BVH8 leaf loads (Core/tiny_bvh.h:6412).

The XLA wave path remains the default (XLA fuses the same math well); this
kernel is the Pallas on-ramp for fusing the full wave body and is compared
against the XLA path in tests (interpret mode on CPU) and microbenches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from physically_based_ray_tracer_tpu.bvh.types import LEAF_COUNT_BITS, LEAF_COUNT_MASK

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    PALLAS_AVAILABLE = True
except ImportError:  # pragma: no cover
    PALLAS_AVAILABLE = False


def _make_kernel(leaf_size: int, n_slots: int):
    def kernel(first_ref, count_ref,             # scalar prefetch: (T*L,)
               o_ref, d_ref, tmax_ref,           # (3, W), (3, W), (1, W) VMEM
               t_in, u_in, v_in, prim_in,        # (1, W) VMEM
               tris_ref,                         # (P, 9) in ANY/HBM
               t_out, u_out, v_out, prim_out,    # (1, W) VMEM
               tri_vmem, sem):                   # scratch: (leaf_size, 9), DMA sem
        step = pl.program_id(0)
        t_out[...] = t_in[...]
        u_out[...] = u_in[...]
        v_out[...] = v_in[...]
        prim_out[...] = prim_in[...]

        ox = o_ref[0:1, :]
        oy = o_ref[1:2, :]
        oz = o_ref[2:3, :]
        dx = d_ref[0:1, :]
        dy = d_ref[1:2, :]
        dz = d_ref[2:3, :]

        def slot_body(l, _):
            idx = step * n_slots + l
            first = first_ref[idx]
            count = count_ref[idx]

            @pl.when(count > 0)
            def _():
                dma = pltpu.make_async_copy(
                    tris_ref.at[pl.ds(first, leaf_size), :], tri_vmem, sem)
                dma.start()
                dma.wait()

                v0x = tri_vmem[:, 0:1]   # (K, 1)
                v0y = tri_vmem[:, 1:2]
                v0z = tri_vmem[:, 2:3]
                e1x = tri_vmem[:, 3:4]
                e1y = tri_vmem[:, 4:5]
                e1z = tri_vmem[:, 5:6]
                e2x = tri_vmem[:, 6:7]
                e2y = tri_vmem[:, 7:8]
                e2z = tri_vmem[:, 8:9]

                px = dy * e2z - dz * e2y   # (K, W)
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
                tx = ox - v0x
                ty = oy - v0y
                tz = oz - v0z
                uu = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det

                kvalid = jax.lax.broadcasted_iota(
                    jnp.int32, tt.shape, 0) < count
                geo_ok = (kvalid & (jnp.abs(det) > 1e-9) & (uu >= 0.0)
                          & (vv >= 0.0) & (uu + vv <= 1.0) & (tt > 0.0))

                for k in range(leaf_size):  # static unroll: slices stay static
                    clip = jnp.minimum(t_out[...], tmax_ref[...])   # (1, W)
                    take = geo_ok[k:k + 1, :] & (tt[k:k + 1, :] < clip)
                    t_out[...] = jnp.where(take, tt[k:k + 1, :], t_out[...])
                    u_out[...] = jnp.where(take, uu[k:k + 1, :], u_out[...])
                    v_out[...] = jnp.where(take, vv[k:k + 1, :], v_out[...])
                    prim_out[...] = jnp.where(take, first + k, prim_out[...])

            return 0

        jax.lax.fori_loop(0, n_slots, slot_body, 0)

    return kernel


def leaf_intersect_pallas(o_t, d_t, tmax_t, t, u, v, prim,
                          leafbuf, nleaf, tris, *, leaf_size: int = 16,
                          interpret: bool = False):
    """Dense leaf phase as a Pallas kernel.

    o_t, d_t: (T, W, 3); tmax_t/t/u/v: (T, W) f32; prim: (T, W) i32;
    leafbuf: (T, L) leaf codes (-1 = empty); nleaf: (T,); tris: (P, 9).
    Returns updated (t, u, v, prim). Matches the XLA dense phase exactly.
    """
    T, W, _ = o_t.shape
    L = leafbuf.shape[1]

    m = -(leafbuf + 1)
    first = jnp.where(leafbuf < 0, m >> LEAF_COUNT_BITS, 0).astype(jnp.int32)
    count_raw = jnp.where(leafbuf < 0, m & LEAF_COUNT_MASK, 0).astype(jnp.int32)
    slot_live = jax.lax.broadcasted_iota(jnp.int32, (T, L), 1) < nleaf[:, None]
    count = jnp.where(slot_live, count_raw, 0)

    o_cw = jnp.swapaxes(o_t, 1, 2)   # (T, 3, W): rays on the lane axis
    d_cw = jnp.swapaxes(d_t, 1, 2)

    tile3 = pl.BlockSpec((1, 3, W), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    tile1 = pl.BlockSpec((1, W), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[tile3, tile3, tile1, tile1, tile1, tile1, tile1,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[tile1, tile1, tile1, tile1],
        scratch_shapes=[
            pltpu.VMEM((leaf_size, 9), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    kernel = _make_kernel(leaf_size, L)

    def body(first_ref, count_ref, o_ref, d_ref, tmax_ref,
             t_in, u_in, v_in, prim_in, tris_ref,
             t_out, u_out, v_out, prim_out, tri_vmem, sem):
        kernel(first_ref, count_ref,
               o_ref[0], d_ref[0], tmax_ref,
               t_in, u_in, v_in, prim_in, tris_ref,
               t_out, u_out, v_out, prim_out, tri_vmem, sem)

    t2, u2, v2, p2 = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, W), t.dtype),
            jax.ShapeDtypeStruct((T, W), u.dtype),
            jax.ShapeDtypeStruct((T, W), v.dtype),
            jax.ShapeDtypeStruct((T, W), prim.dtype),
        ],
        interpret=interpret,
    )(first.reshape(-1), count.reshape(-1), o_cw, d_cw, tmax_t,
      t, u, v, prim, tris)
    return t2, u2, v2, p2
