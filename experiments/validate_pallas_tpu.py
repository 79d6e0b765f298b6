"""On-chip validation + timing of the Pallas dense traversal kernel.

Correctness: compares compiled-on-TPU hits against the CPU brute-force
oracle (fetched via small host transfers). Timing: slope method (devtime).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

from devtime import fetch_scalar

T0 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter()-T0:7.1f}s] {m}", flush=True)


def main():
    import bench as bench_mod
    from physically_based_ray_tracer_tpu.ops.pallas_trace import (
        intersect_any_dense, intersect_closest_dense)
    from physically_based_ray_tracer_tpu.scene.camera import primary_rays

    scene, cam, depth = bench_mod.build_bench_scene()
    dbvh = scene.dense
    log(f"dense bvh: {dbvh.n_nodes} nodes, {dbvh.n_groups} groups "
        f"({dbvh.groups.nbytes/1e6:.1f} MB groups)")

    W = H = 256
    B = W * H
    ids = np.arange(B, dtype=np.int32)
    xs = jnp.asarray((ids % W).astype(np.float32))
    ys = jnp.asarray((ids // W).astype(np.float32))
    o, d = primary_rays(cam, xs, ys, W, H)

    # --- correctness: checksum compare vs CPU interpret result -------------
    hit = jax.jit(lambda o, d: intersect_closest_dense(dbvh, o, d))(o, d)
    t_sum = fetch_scalar(jnp.sum(jnp.where(hit.t < 1e29, hit.t, 0.0)))
    n_hit = fetch_scalar(jnp.sum((hit.prim >= 0).astype(jnp.float32)))
    prim_sum = fetch_scalar(jnp.sum(jnp.maximum(hit.prim, 0).astype(jnp.float64)
                                    if False else
                                    jnp.maximum(hit.prim, 0).astype(jnp.float32)))
    log(f"TPU: n_hit={n_hit:.0f} t_sum={t_sum:.3f} prim_sum={prim_sum:.0f}")

    # --- timing: closest-hit wave over 1M rays ------------------------------
    for B2, label in ((1 << 20, "1M primary-ish"),):
        reps = B2 // B
        o2 = jnp.tile(o, (reps, 1))
        d2 = jnp.tile(d, (reps, 1))

        def make(L):
            @jax.jit
            def run():
                def body(i, c):
                    oo, acc = c
                    h = intersect_closest_dense(dbvh, oo, d2)
                    return oo + 1e-9 * h.t[:, None], acc + jnp.sum(h.t) * 1e-9
                oo, acc = jax.lax.fori_loop(0, L, body,
                                            (o2, jnp.float32(0)))
                return acc + jnp.sum(oo) * 0.0
            return run
        f1, f2 = make(1), make(5)
        fetch_scalar(f1()); fetch_scalar(f2())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); fetch_scalar(f1()); t1 = time.perf_counter()
            fetch_scalar(f2()); t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / 4)
        log(f"closest {label} ({B2} rays): {best*1e3:.1f} ms/wave -> "
            f"{B2/best/1e6:.1f} Mrays/s")

        # anyhit timing (shadow-like: toward a point light)
        lp = jnp.asarray([2.0, 3.0, 2.0])
        hitp = intersect_closest_dense(dbvh, o2, d2)
        pts = o2 + d2 * jnp.where(hitp.t[:, None] < 1e29, hitp.t[:, None], 1.0)
        lv = lp[None, :] - pts
        dist = jnp.linalg.norm(lv, axis=1)
        sd = lv / dist[:, None]
        so = pts + sd * 0.01

        def make_any(L):
            @jax.jit
            def run():
                def body(i, c):
                    acc = c
                    occ = intersect_any_dense(dbvh, so + acc * 1e-12, sd,
                                              dist - 0.01)
                    return acc + jnp.sum(occ.astype(jnp.float32)) * 1e-9
                return jax.lax.fori_loop(0, L, body, jnp.float32(0))
            return run
        f1, f2 = make_any(1), make_any(5)
        fetch_scalar(f1()); fetch_scalar(f2())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); fetch_scalar(f1()); t1 = time.perf_counter()
            fetch_scalar(f2()); t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / 4)
        log(f"anyhit  {label} ({B2} rays): {best*1e3:.1f} ms/wave -> "
            f"{B2/best/1e6:.1f} Mrays/s")

    # --- CPU oracle comparison (brute force on numpy, host side) ------------
    log("computing CPU oracle (numpy brute force)...")
    tri_v0 = np.asarray(scene.tri_v0)
    tri_e1 = np.asarray(scene.tri_e1)
    tri_e2 = np.asarray(scene.tri_e2)
    on = np.asarray(o)
    dn = np.asarray(d)
    # chunked numpy MT
    best_t = np.full(B, 1e30, np.float32)
    n_hits = np.zeros(B, bool)
    for s in range(0, tri_v0.shape[0], 4096):
        v0 = tri_v0[s:s+4096][None]
        e1 = tri_e1[s:s+4096][None]
        e2 = tri_e2[s:s+4096][None]
        pv = np.cross(dn[:, None, :], e2)
        det = np.sum(e1 * pv, axis=-1)
        inv = np.where(np.abs(det) > 1e-9, 1.0 / np.where(det == 0, 1, det), 0.0)
        tv = on[:, None, :] - v0
        u = np.sum(tv * pv, axis=-1) * inv
        qv = np.cross(tv, e1)
        v = np.sum(dn[:, None, :] * qv, axis=-1) * inv
        t = np.sum(e2 * qv, axis=-1) * inv
        ok = (np.abs(det) > 1e-9) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
        t = np.where(ok, t, 1e30)
        best_t = np.minimum(best_t, t.min(axis=1).astype(np.float32))
        n_hits |= ok.any(axis=1)
    ref_t_sum = best_t[best_t < 1e29].sum()
    log(f"oracle: n_hit={n_hits.sum()} t_sum={ref_t_sum:.3f}")
    log(f"match: n_hit {'OK' if abs(n_hits.sum()-n_hit) < 1 else 'MISMATCH'}, "
        f"t_sum rel err {abs(ref_t_sum-t_sum)/max(ref_t_sum,1e-9):.2e}")


if __name__ == "__main__":
    log(f"device: {jax.devices()[0]}")
    main()
