"""Knot-curve tests: interpolation correctness of the paper-mode curve,
regularizer math, and fork-mode parity with the reference's arithmetic."""

import jax.numpy as jnp
import numpy as np
import pytest

from curl_tpu.ops import curves

from reference_oracle import load, requires_reference


class TestPaperMode:
    def test_identity_curve(self, rng):
        # Knots all equal to 1 -> scale 1 everywhere -> image unchanged.
        img = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
        knots = jnp.ones((2, 16), jnp.float32)
        out, reg = curves.apply_curve(img, knots, 0, 0, mode="paper")
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
        np.testing.assert_allclose(np.asarray(reg), 0.0, atol=0)

    def test_interpolates_knots(self):
        # At pixel value i/(K-1) the scale must equal knot C[i] exactly.
        k = 8
        knots_np = np.linspace(0.5, 2.0, k).astype(np.float32)[None]
        knots_np[0, 3] = 1.7  # break linearity
        pix = np.linspace(0, 1, k).astype(np.float32).reshape(1, 1, k)
        scale = np.asarray(curves.curve_scale(jnp.asarray(pix), jnp.asarray(knots_np)))
        np.testing.assert_allclose(scale[0, 0], knots_np[0], atol=1e-5)

    def test_piecewise_linear_between_knots(self):
        k = 5
        knots = jnp.asarray(np.array([[1.0, 2.0, 0.5, 1.5, 1.0]], np.float32))
        # Midpoint of segment 1 -> average of knots 1 and 2.
        pix = jnp.full((1, 1, 1), (1.0 + 2.0) / 2.0 / (k - 1), jnp.float32)
        scale = curves.curve_scale(pix, knots)
        np.testing.assert_allclose(float(scale[0, 0, 0]), (2.0 + 0.5) / 2, atol=1e-5)

    def test_smoothness_regularizer(self):
        knots = jnp.asarray(np.array([[0.0, 1.0, 3.0, 6.0]], np.float32))
        # slopes = [1, 2, 3]; diffs = [1, 1]; sum of squares = 2.
        np.testing.assert_allclose(float(curves.slope_smoothness(knots)[0]), 2.0)

    def test_adjusters_shapes_and_grads(self, rng):
        import jax

        img = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
        for fn, ncurves, k in [
            (curves.adjust_rgb, 3, 48 // 3),
            (curves.adjust_lab, 3, 48 // 3),
            (curves.adjust_hsv, 4, 64 // 4),
        ]:
            params = jnp.asarray(
                rng.normal(scale=0.05, size=(2, ncurves * k)).astype(np.float32)
            )
            out, reg = fn(img, params)
            assert out.shape == img.shape
            assert reg.shape == (2,)
            g = jax.grad(lambda p: jnp.sum(fn(img, p)[0]) + jnp.sum(fn(img, p)[1]))(params)
            assert np.isfinite(np.asarray(g)).all()

    def test_output_clamped(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, (1, 4, 4, 3)).astype(np.float32))
        params = jnp.asarray(np.full((1, 48), 2.0, np.float32))  # exp(2) ~ 7.4x
        out, _ = curves.adjust_rgb(img, params)
        assert float(out.max()) <= 1.0 and float(out.min()) >= 0.0


@requires_reference
class TestForkParity:
    """Fork mode replicates the reference's exact (unclamped) arithmetic.

    The reference's own `apply_curve` crashes on its regularizer
    (`None += tensor`, curves.py:24,56), so parity is tested against the
    scale computation only, with the regularizer accumulator pre-seeded."""

    def test_fork_scale_parity(self, rng):
        import torch

        ref = load("curves")
        img = rng.uniform(0, 1, (2, 6, 6, 3)).astype(np.float32)
        knots = np.exp(rng.normal(scale=0.1, size=(2, 16))).astype(np.float32)

        t_img = torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2)))
        with torch.no_grad():
            t_out, t_reg = ref.apply_curve(
                t_img,
                torch.from_numpy(knots),
                torch.zeros(2),  # pre-seeded accumulator avoids the None bug
                channel_in=0,
                channel_out=1,
            )
        j_out, j_reg = curves.apply_curve(
            jnp.asarray(img), jnp.asarray(knots), 0, 1, mode="fork"
        )
        np.testing.assert_allclose(
            np.asarray(j_out), t_out.numpy().transpose(0, 2, 3, 1), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(j_reg), t_reg.numpy(), atol=1e-5)
