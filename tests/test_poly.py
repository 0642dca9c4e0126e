"""Polynomial-layer tests: basis ordering, incremental-chain correctness, and
numerical parity with the reference ChannelPolyLayer / Deg4MobilePolyLayer."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from curl_tpu.ops import poly

from reference_oracle import load, requires_reference


class TestBasis:
    def test_counts(self):
        assert poly.num_monomials(4, 5) == 126
        assert poly.num_monomials(3, 2) == 10
        for d in range(5):
            for v in range(1, 6):
                assert len(poly.monomial_powers(d, v)) == math.comb(v + d, d)

    def test_docstring_order_deg3_2vars(self):
        # Reference model.py:304-310 documents (1, x, y, x2, xy, y2, x3,
        # x2y, xy2, y3) for degree 3 in 2 variables.
        expected = [
            (0, 0), (1, 0), (0, 1), (2, 0), (1, 1), (0, 2),
            (3, 0), (2, 1), (1, 2), (0, 3),
        ]
        assert list(poly.monomial_powers(3, 2)) == expected

    def test_graded_reverse_lex_property(self):
        # Ascending total degree; within a degree, lexicographically
        # descending exponent tuples — the reference generator's order.
        for d, v in [(4, 5), (3, 3), (2, 4)]:
            powers = poly.monomial_powers(d, v)
            keys = [(sum(p), tuple(-e for e in p)) for p in powers]
            assert keys == sorted(keys)

    def test_chain_reconstructs_monomials(self, rng):
        x = rng.uniform(0.5, 1.5, size=5)
        powers = poly.monomial_powers(4, 5)
        chain = poly.monomial_chain(4, 5)
        vals = [1.0]
        for parent, var in chain:
            vals.append(vals[parent] * x[var])
        expected = [np.prod(x**np.array(p)) for p in powers]
        np.testing.assert_allclose(vals, expected, rtol=1e-12)

    def test_monomial_basis_matches_explicit(self, rng):
        img = rng.uniform(0, 1, size=(2, 3, 4, 5)).astype(np.float32)
        basis = np.asarray(
            poly.monomial_basis([jnp.asarray(img[..., i]) for i in range(5)], 4)
        )
        powers = np.array(poly.monomial_powers(4, 5), np.float64)
        expected = np.prod(
            img.astype(np.float64)[..., None, :] ** powers[None, None, None], axis=-1
        )
        np.testing.assert_allclose(basis, expected, rtol=2e-5, atol=1e-6)


class TestPolyApply:
    def test_linear_identity(self, rng):
        # Degree-1 polynomial with coefficients selecting channel c must act
        # as a per-channel affine map.
        img = rng.uniform(0, 1, size=(2, 4, 4, 3)).astype(np.float32)
        coeffs = np.zeros((2, 3, 4), np.float32)  # (B, out, 1+V)
        coeffs[:, 0, 1] = 1.0  # out0 = r
        coeffs[:, 1, 2] = 2.0  # out1 = 2g
        coeffs[:, 2, 0] = 0.5  # out2 = 0.5
        out = np.asarray(poly.poly_apply(jnp.asarray(img), jnp.asarray(coeffs), degree=1))
        np.testing.assert_allclose(out[..., 0], img[..., 0], rtol=1e-6)
        np.testing.assert_allclose(out[..., 1], 2 * img[..., 1], rtol=1e-6)
        np.testing.assert_allclose(out[..., 2], 0.5, rtol=1e-6)

    def test_gradient_flows_to_coeffs(self, rng):
        import jax

        img = jnp.asarray(rng.uniform(0, 1, size=(1, 4, 4, 5)).astype(np.float32))
        coeffs = jnp.asarray(rng.normal(size=(1, 3, 126)).astype(np.float32))
        g = jax.grad(lambda c: jnp.sum(poly.poly_apply(img, c, degree=4)))(coeffs)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_matmul_form_matches_acc_value_and_grad(self, rng):
        """The MXU-matmul basis form (training fast path) must equal the
        accumulation form in both the output and the coefficient gradient
        — the quantities real training consumes."""
        import jax

        img = jnp.asarray(rng.uniform(0, 1, size=(2, 8, 8, 5)).astype(np.float32))
        coeffs = jnp.asarray(
            rng.normal(scale=0.1, size=(2, 3, 126)).astype(np.float32)
        )
        oa = poly.poly_apply(img, coeffs, degree=4, form="acc")
        om = poly.poly_apply(img, coeffs, degree=4, form="matmul")
        np.testing.assert_allclose(np.asarray(oa), np.asarray(om), atol=1e-5)
        ga = jax.grad(
            lambda c: jnp.sum(poly.poly_apply(img, c, degree=4, form="acc"))
        )(coeffs)
        gm = jax.grad(
            lambda c: jnp.sum(poly.poly_apply(img, c, degree=4, form="matmul"))
        )(coeffs)
        scale = float(jnp.abs(ga).max())
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gm), atol=1e-6 * max(scale, 1.0)
        )


@requires_reference
class TestReferenceParity:
    @pytest.fixture(scope="class")
    def ref_model(self):
        return load("model")

    def test_powers_ordering_matches_reference_generator(self, ref_model):
        for d, v in [(4, 5), (3, 3), (2, 2), (1, 4), (0, 3), (4, 1)]:
            ref_powers = list(ref_model.ChannelPolyLayer.generate_powers(d, v))
            assert list(poly.monomial_powers(d, v)) == ref_powers, (d, v)

    def test_channel_poly_layer_parity(self, rng, ref_model):
        import torch

        layer = ref_model.ChannelPolyLayer(degree=4, num_variables=5, num_out=3)
        img = rng.uniform(0, 1, size=(2, 6, 8, 5)).astype(np.float32)
        coeffs = rng.normal(scale=0.3, size=(2, 3, 126)).astype(np.float32)
        with torch.no_grad():
            t_out = (
                layer(
                    torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2))),
                    torch.from_numpy(coeffs),
                )
                .numpy()
                .transpose(0, 2, 3, 1)
            )
        j_out = np.asarray(poly.poly_apply(jnp.asarray(img), jnp.asarray(coeffs), degree=4))
        np.testing.assert_allclose(j_out, t_out, atol=5e-5, rtol=1e-5)

    def test_deg4_mobile_layer_equivalence(self, rng, ref_model):
        # The mobile layer is documented bit-identical to ChannelPolyLayer
        # (model.py:404-409); transitively ours must match it too.
        import torch

        layer = ref_model.Deg4MobilePolyLayer()
        img = rng.uniform(0, 1, size=(1, 4, 4, 5)).astype(np.float32)
        coeffs = rng.normal(scale=0.3, size=(1, 3, 126)).astype(np.float32)
        with torch.no_grad():
            t_out = (
                layer(
                    torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2))),
                    torch.from_numpy(coeffs),
                )
                .numpy()
                .transpose(0, 2, 3, 1)
            )
        j_out = np.asarray(poly.poly_apply(jnp.asarray(img), jnp.asarray(coeffs), degree=4))
        np.testing.assert_allclose(j_out, t_out, atol=5e-5, rtol=1e-5)
