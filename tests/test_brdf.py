"""BRDF stack parity + sampling correctness.

Golden values are computed from the published formulas (boksa's "Crash Course
in BRDF Implementation", which the reference ports at Core/BRDF.cpp) with an
independent float64 numpy evaluation inside the test, including the
reference's quirks (MIN_DIELECTRICS_F0 = 0.4, shadowedF90 = lum(F0)/0.4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from physically_based_ray_tracer_tpu.config import BRDFConfig, DiffuseModel, NDF
from physically_based_ray_tracer_tpu.ops import brdf, sampling

PI = np.pi


def nvec(*xyz):
    v = np.asarray(xyz, np.float64)
    return v / np.linalg.norm(v)


def mat(base=(0.8, 0.4, 0.2), metal=0.0, rough=0.5, emissive=(0, 0, 0)):
    return brdf.MaterialProperties.make(base, metal, emissive, rough)


class TestFormulaGolden:
    def test_luminance(self):
        got = float(brdf.luminance(jnp.asarray([0.25, 0.5, 0.75])))
        assert np.isclose(got, 0.2126 * 0.25 + 0.7152 * 0.5 + 0.0722 * 0.75, rtol=1e-6)

    def test_specular_f0_min_dielectric_quirk(self):
        # metalness 0 must yield the reference's 0.4 floor (Core/BRDF.h:65)
        f0 = np.asarray(brdf.base_color_to_specular_f0(
            jnp.asarray([0.9, 0.9, 0.9]), jnp.asarray(0.0)))
        np.testing.assert_allclose(f0, 0.4, rtol=1e-6)
        f0m = np.asarray(brdf.base_color_to_specular_f0(
            jnp.asarray([0.9, 0.8, 0.7]), jnp.asarray(1.0)))
        np.testing.assert_allclose(f0m, [0.9, 0.8, 0.7], rtol=1e-6)

    def test_fresnel_schlick(self):
        f0 = np.asarray([0.04, 0.5, 1.0])
        ndots = 0.3
        want = f0 + (1.0 - f0) * (1 - ndots) ** 5
        got = np.asarray(brdf.eval_fresnel_schlick(
            jnp.asarray(f0), jnp.asarray(1.0), jnp.asarray(ndots)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_shadowed_f90(self):
        f0 = np.asarray([0.1, 0.1, 0.1])
        lum = 0.2126 * 0.1 + 0.7152 * 0.1 + 0.0722 * 0.1
        want = min(1.0, lum / 0.4)
        got = float(brdf.shadowed_f90(jnp.asarray(f0)))
        assert np.isclose(got, want, rtol=1e-6)

    def test_ggx_d(self):
        a2, ndoth = 0.25, 0.8
        want = a2 / (PI * ((a2 - 1) * ndoth**2 + 1) ** 2)
        got = float(brdf.ggx_d(jnp.asarray(a2), jnp.asarray(ndoth)))
        assert np.isclose(got, want, rtol=1e-6)

    def test_beckmann_d(self):
        a2, ndoth = 0.09, 0.9
        c2 = ndoth * ndoth
        want = np.exp((c2 - 1) / (a2 * c2)) / (PI * a2 * c2 * c2)
        got = float(brdf.beckmann_d(jnp.asarray(a2), jnp.asarray(ndoth)))
        assert np.isclose(got, want, rtol=1e-5)

    def test_g2_lagarde_height_correlated(self):
        a2, nl, nv = 0.25, 0.6, 0.8
        a = nv * np.sqrt(a2 + nl * (nl - a2 * nl))
        b = nl * np.sqrt(a2 + nv * (nv - a2 * nv))
        want = 0.5 / (a + b)
        got = float(brdf.smith_g2_height_correlated_ggx_lagarde(
            jnp.asarray(a2), jnp.asarray(nl), jnp.asarray(nv)))
        assert np.isclose(got, want, rtol=1e-6)

    def test_smith_g1_ggx(self):
        a2, ns = 0.25, 0.7
        ns2 = ns * ns
        want = 2.0 / (np.sqrt(((a2 * (1 - ns2)) + ns2) / ns2) + 1)
        got = float(brdf.smith_g1_ggx(jnp.asarray(a2), jnp.asarray(ns2)))
        assert np.isclose(got, want, rtol=1e-6)

    def test_eval_microfacet_full_chain(self):
        """End-to-end evalCombinedBRDF against a float64 scalar evaluation."""
        n = nvec(0, 0, 1)
        l = nvec(0.3, 0.2, 0.9)
        v = nvec(-0.4, 0.1, 0.8)
        base = np.asarray([0.8, 0.4, 0.2])
        metal, rough = 0.3, 0.4

        h = nvec(*(l + v))
        ndotl = max(min(n @ l, 1.0), 1e-5)
        ndotv = max(min(n @ v, 1.0), 1e-5)
        ldoth = np.clip(l @ h, 0, 1)
        ndoth = np.clip(n @ h, 0, 1)
        f0 = 0.4 + (base - 0.4) * metal
        f90 = min(1.0, (f0 @ [0.2126, 0.7152, 0.0722]) / 0.4)
        F = f0 + (f90 - f0) * (1 - ldoth) ** 5
        alpha = rough * rough
        a2 = alpha * alpha
        D = a2 / (PI * ((a2 - 1) * ndoth**2 + 1) ** 2)
        G2 = 0.5 / (ndotv * np.sqrt(a2 + ndotl * (ndotl - a2 * ndotl))
                    + ndotl * np.sqrt(a2 + ndotv * (ndotv - a2 * ndotv)))
        specular = F * (G2 * D * ndotl)
        diffuse = base * (1 - metal) * (ndotl / PI)
        want = (1.0 - F) * diffuse + specular

        got = np.asarray(brdf.eval_combined_brdf(
            jnp.asarray(n, jnp.float32), jnp.asarray(l, jnp.float32),
            jnp.asarray(v, jnp.float32), mat(base, metal, rough)))
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_backfacing_is_black(self):
        n = jnp.asarray([0.0, 0.0, 1.0])
        l = jnp.asarray([0.0, 0.0, -1.0])  # light below surface
        v = jnp.asarray([0.0, 0.0, 1.0])
        got = np.asarray(brdf.eval_combined_brdf(n, l, v, mat()))
        np.testing.assert_array_equal(got, 0.0)

    def test_brdf_probability_bounds_and_value(self):
        # formula check (Core/BRDF.cpp:504-526)
        base = np.asarray([0.8, 0.4, 0.2])
        lum = lambda c: float(np.dot(np.broadcast_to(c, (3,)), [0.2126, 0.7152, 0.0722]))
        for metal in [0.0, 0.5, 1.0]:
            f0 = lum(0.4 + (base - 0.4) * metal)
            dr = lum(base * (1 - metal))
            ndv = 0.9
            f90 = min(1.0, f0 / 0.4)
            fres = np.clip(f0 + (f90 - f0) * (1 - ndv) ** 5, 0, 1)
            adj = fres * 0.5
            want = np.clip(adj / max(1e-4, adj + dr * (1 - adj) * 1.5), 0.05, 0.7)
            got = float(brdf.get_brdf_probability(
                mat(base, metal), jnp.asarray([0.0, np.sqrt(1 - ndv**2), ndv]),
                jnp.asarray([0.0, 0.0, 1.0])))
            assert np.isclose(got, want, rtol=1e-4), (metal, got, want)

    def test_srgb_roundtrip_values(self):
        c = jnp.asarray([0.0, 0.04045, 0.5, 1.0])
        got = np.asarray(brdf.srgb_to_linear(c))
        want = np.where(np.asarray(c) <= 0.04045, np.asarray(c) / 12.92,
                        ((np.asarray(c) + 0.055) / 1.055) ** 2.4)
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestSampling:
    def test_cosine_hemisphere_distribution(self):
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.uniform(0, 1, (20000, 2)).astype(np.float32))
        d, pdf = sampling.sample_hemisphere_cosine(u)
        d = np.asarray(d)
        assert (d[:, 2] >= 0).all()
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
        # E[cos theta] under cosine-weighted sampling = 2/3
        assert np.isclose(d[:, 2].mean(), 2.0 / 3.0, atol=0.01)
        np.testing.assert_allclose(np.asarray(pdf), d[:, 2] / PI, atol=1e-5)

    def test_vndf_normals_above_hemisphere(self):
        rng = np.random.default_rng(1)
        u = jnp.asarray(rng.uniform(0, 1, (5000, 2)).astype(np.float32))
        ve = jnp.broadcast_to(jnp.asarray(nvec(0.5, 0.1, 0.6), jnp.float32), (5000, 3))
        alpha = jnp.full((5000, 2), 0.3, jnp.float32)
        h = np.asarray(sampling.sample_ggx_vndf_heitz(ve, alpha, u))
        assert (h[:, 2] >= 0).all()
        np.testing.assert_allclose(np.linalg.norm(h, axis=1), 1.0, atol=1e-5)
        # every sampled half-vector must be visible from V
        assert (np.asarray(ve) * h).sum(-1).min() >= 0

    def test_vndf_matches_ndf_statistics(self):
        """MC check: E[G1 * (V.H) / (V.Z)] over VNDF samples integrates D ~ 1."""
        rng = np.random.default_rng(2)
        n = 200000
        u = jnp.asarray(rng.uniform(0, 1, (n, 2)).astype(np.float32))
        ve = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
        alpha = jnp.full((n, 2), 0.5, jnp.float32)
        h = np.asarray(sampling.sample_ggx_vndf_heitz(ve, alpha, u))
        # at normal incidence VNDF pdf = D * ndoth / ... reduces to cosine-D:
        # check mean cos^2 statistic against analytic GGX expectation
        a2 = 0.25
        cos2 = h[:, 2] ** 2
        # With u = cos(theta), the VNDF pdf at normal incidence is
        # proportional to D(u) * u du, so E[cos^2] = int u^3 D / int u D.
        u_ = np.linspace(1e-6, 1, 200001)
        d_ = a2 / (PI * ((a2 - 1) * u_**2 + 1) ** 2)
        want = np.trapezoid(u_**3 * d_, u_) / np.trapezoid(u_ * d_, u_)
        assert np.isclose(cos2.mean(), want, atol=0.01)

    def test_specular_sample_zero_roughness_is_mirror(self):
        v = jnp.asarray([[0.3, -0.2, 0.93]], jnp.float32)
        v = v / jnp.linalg.norm(v)
        l, w = brdf.sample_specular_microfacet(
            v, jnp.zeros((1,)), jnp.zeros((1,)),
            jnp.asarray([[1.0, 1.0, 1.0]]), jnp.asarray([[0.3, 0.7]]))
        mirror = np.asarray([-v[0, 0], -v[0, 1], v[0, 2]])
        np.testing.assert_allclose(np.asarray(l)[0], mirror, atol=1e-5)

    def test_indirect_diffuse_weight_bounded(self):
        rng = np.random.default_rng(3)
        B = 4096
        u = jnp.asarray(rng.uniform(0, 1, (B, 2)).astype(np.float32))
        n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (B, 3))
        v = jnp.broadcast_to(jnp.asarray(nvec(0.2, 0.1, 0.95), jnp.float32), (B, 3))
        m = mat((0.8, 0.8, 0.8), 0.0, 0.6)
        m = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), m)
        d, w, valid = brdf.eval_indirect_combined_brdf(
            u, n, n, v, m, jnp.full((B,), brdf.DIFFUSE_TYPE, jnp.int32))
        w = np.asarray(w)
        assert np.asarray(valid).all()
        assert (w >= 0).all() and (w <= 1.0 + 1e-5).all()
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-5)

    def test_indirect_specular_weight_reasonable(self):
        rng = np.random.default_rng(4)
        B = 4096
        u = jnp.asarray(rng.uniform(0, 1, (B, 2)).astype(np.float32))
        n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (B, 3))
        v = jnp.broadcast_to(jnp.asarray(nvec(0.3, 0.0, 0.95), jnp.float32), (B, 3))
        m = mat((1.0, 1.0, 1.0), 1.0, 0.4)
        m = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), m)
        d, w, valid = brdf.eval_indirect_combined_brdf(
            u, n, n, v, m, jnp.full((B,), brdf.SPECULAR_TYPE, jnp.int32))
        w = np.asarray(w)
        # VNDF weight = F * G2/G1 which is <= 1 per channel
        assert (w <= 1.0 + 1e-4).all()
        assert (w >= 0).all()

    def test_quaternion_frame_roundtrip(self):
        from physically_based_ray_tracer_tpu.utils.math import (
            quat_invert, quat_rotate, quat_rotation_to_z)
        rng = np.random.default_rng(5)
        n = rng.normal(size=(100, 3))
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        q = quat_rotation_to_z(jnp.asarray(n, jnp.float32))
        z = np.asarray(quat_rotate(q, jnp.asarray(n, jnp.float32)))
        np.testing.assert_allclose(z, np.tile([0, 0, 1.0], (100, 1)), atol=1e-5)
        back = np.asarray(quat_rotate(quat_invert(q), jnp.asarray(z, jnp.float32)))
        np.testing.assert_allclose(back, n, atol=1e-5)


class TestConfigMatrix:
    def test_beckmann_walter_paths_run(self):
        cfg = BRDFConfig(ndf=NDF.BECKMANN)
        n = jnp.asarray([0.0, 0.0, 1.0])
        l = jnp.asarray(nvec(0.2, 0.1, 0.9), jnp.float32)
        v = jnp.asarray(nvec(-0.3, 0.2, 0.9), jnp.float32)
        out = np.asarray(brdf.eval_combined_brdf(n, l, v, mat(), cfg))
        assert np.isfinite(out).all() and (out >= 0).all()

    def test_diffuse_models_finite(self):
        n = jnp.asarray([0.0, 0.0, 1.0])
        l = jnp.asarray(nvec(0.2, 0.1, 0.9), jnp.float32)
        v = jnp.asarray(nvec(-0.3, 0.2, 0.9), jnp.float32)
        for dm in [DiffuseModel.LAMBERTIAN, DiffuseModel.OREN_NAYAR,
                   DiffuseModel.DISNEY, DiffuseModel.FROSTBITE, DiffuseModel.NONE]:
            out = np.asarray(brdf.eval_combined_brdf(n, l, v, mat(), BRDFConfig(diffuse=dm)))
            assert np.isfinite(out).all(), dm
