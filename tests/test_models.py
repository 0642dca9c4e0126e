"""Model-level tests: shapes, the low-res-predict/full-res-apply hook,
backbone parameter budget, and the curve model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curl_tpu import models
from curl_tpu.models import backbone as bb
from curl_tpu.ops import enhance


def _init_batch(rng, b=2, s=64):
    img = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32))
    mask = jnp.ones((b, s, s, 1), jnp.float32)
    return img, mask


@pytest.fixture(scope="module")
def tiny_net_and_vars():
    net = models.TriSpacePolyNet(backbone="tiny")
    img = jnp.zeros((1, 64, 64, 3))
    mask = jnp.ones((1, 64, 64, 1))
    variables = net.init(jax.random.PRNGKey(0), img, mask)
    return net, variables


class TestTriSpacePolyNet:
    def test_output_shape_and_range(self, rng, tiny_net_and_vars):
        net, variables = tiny_net_and_vars
        img, mask = _init_batch(rng)
        out = net.apply(variables, img, mask)
        assert out.shape == img.shape
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_residual_mode(self, rng, tiny_net_and_vars):
        net, variables = tiny_net_and_vars
        img, mask = _init_batch(rng, b=1)
        res = net.apply(variables, img, mask, return_residual=True)
        out = net.apply(variables, img, mask)
        np.testing.assert_allclose(
            np.asarray(out), np.clip(np.asarray(img) + np.asarray(res), 0, 1), atol=1e-6
        )

    def test_low_res_predict_full_res_apply(self, rng, tiny_net_and_vars):
        # Coefficients predicted at 64px, residual applied at 160px — the
        # reference's target_img hook (model.py:529-535).
        net, variables = tiny_net_and_vars
        img, mask = _init_batch(rng, b=1, s=64)
        target = jnp.asarray(rng.uniform(0, 1, (1, 160, 192, 3)).astype(np.float32))
        res = net.apply(variables, img, mask, target, return_residual=True)
        assert res.shape == target.shape

    def test_apply_resolution_consistency(self, rng, tiny_net_and_vars):
        # Same coefficients applied at two resolutions must agree where the
        # normalized coordinates coincide (pixel (0,0) has x=y=0 at any res).
        net, variables = tiny_net_and_vars
        img, mask = _init_batch(rng, b=1, s=64)
        r_lo, l_lo, h_lo = net.apply(
            variables, img, mask, method=net.generate_coefficients
        )
        same_pixel = jnp.broadcast_to(img[:, :1, :1, :], (1, 64, 64, 3))
        res_a = enhance.trispace_residual(same_pixel[:, :1, :1], r_lo, l_lo, h_lo)
        res_b = enhance.trispace_residual(same_pixel, r_lo, l_lo, h_lo)
        np.testing.assert_allclose(
            np.asarray(res_a)[0, 0, 0], np.asarray(res_b)[0, 0, 0], atol=1e-6
        )

    def test_train_mode_updates_batch_stats(self, rng, tiny_net_and_vars):
        net, variables = tiny_net_and_vars
        img, mask = _init_batch(rng, b=2)
        out, updates = net.apply(
            variables, img, mask, train=True, mutable=["batch_stats"]
        )
        assert out.shape == img.shape
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
        )

    def test_masked_input_drives_coefficients(self, rng, tiny_net_and_vars):
        net, variables = tiny_net_and_vars
        img, _ = _init_batch(rng, b=1)
        full = jnp.ones((1, 64, 64, 1), jnp.float32)
        half = full.at[:, :, 32:].set(0.0)
        r1, *_ = net.apply(variables, img, full, method=net.generate_coefficients)
        r2, *_ = net.apply(variables, img, half, method=net.generate_coefficients)
        assert float(jnp.abs(r1 - r2).max()) > 0


class TestBackbone:
    def test_rw_t_parameter_budget(self):
        # timm's efficientnetv2_rw_t reports ~13.6M params; ours must land in
        # the same ballpark (exact layout verified by the checkpoint
        # converter round-trip tests).
        net = bb.EfficientNetV2(bb.EFFICIENTNETV2_RW_T)
        variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
        assert 12e6 < n_params < 15e6, n_params

    def test_feature_dim(self):
        net = bb.EfficientNetV2(bb.TINY)
        variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
        out = net.apply(variables, jnp.zeros((2, 64, 64, 3)), False)
        assert out.shape == (2, bb.TINY.num_features)

    def test_stride_reduces_resolution(self):
        # rw_t has stem stride 2 plus four stride-2 stages -> /32 before pool.
        net = bb.EfficientNetV2(bb.EFFICIENTNETV2_RW_T)
        variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
        out = net.apply(variables, jnp.zeros((1, 64, 64, 3)), False)
        assert out.shape == (1, 1024)


class TestCurveNet:
    def test_forward(self, rng):
        net = models.CurlCurveNet(backbone="tiny")
        img, mask = _init_batch(rng, b=1)
        variables = net.init(jax.random.PRNGKey(0), img, mask)
        out, reg = net.apply(variables, img, mask)
        assert out.shape == img.shape
        assert reg.shape == (1,)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_default_knot_counts(self):
        net = models.CurlCurveNet()
        assert net.num_lab_points == 48
        assert net.num_rgb_points == 48
        assert net.num_hsv_points == 64

    def test_low_res_predict_full_res_apply(self, rng):
        """The curve model's target_img hook: knots from the small view,
        curves applied at the target's resolution; the same knots applied
        directly must reproduce the output."""
        from curl_tpu.models.curl_curve import curl_curve_layer

        net = models.CurlCurveNet(backbone="tiny")
        img, mask = _init_batch(rng, b=2, s=32)
        target = jnp.asarray(rng.uniform(0, 1, (2, 48, 40, 3)).astype(np.float32))
        variables = net.init(jax.random.PRNGKey(0), img, mask)
        out, reg = net.apply(variables, img, mask, target)
        assert out.shape == target.shape
        out_small, _ = net.apply(variables, img, mask)
        assert out_small.shape == img.shape
        # A target mask confines the enhancement.
        tmask = jnp.zeros((2, 48, 40, 1), jnp.float32)
        out_masked, _ = net.apply(variables, img, mask, target, tmask)
        np.testing.assert_allclose(np.asarray(out_masked), 0.0, atol=1e-6)


class TestPolyRegNet:
    def test_forward(self, rng):
        net = models.PolyRegNet(backbone="tiny")
        img, mask = _init_batch(rng, b=1)
        variables = net.init(jax.random.PRNGKey(0), img, mask)
        out = net.apply(variables, img, mask)
        assert out.shape == img.shape
