"""CURL loss and metric tests, incl. parity with the reference CURLLoss and
PSNRMetric."""

import jax.numpy as jnp
import numpy as np
import pytest

from curl_tpu.models import losses, metrics

from reference_oracle import load, requires_reference


def _batch(rng, b=2, h=64, w=64, mask_frac=0.8):
    pred = rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
    tgt = rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
    mask = (rng.uniform(size=(b, h, w, 1)) < mask_frac).astype(np.float32)
    return pred, tgt, mask


class TestLossProperties:
    def test_identical_images_low_loss(self, rng):
        pred, _, mask = _batch(rng)
        l_same = float(losses.curl_loss(jnp.asarray(pred), jnp.asarray(pred), jnp.asarray(mask)))
        _, tgt, _ = _batch(rng)
        l_diff = float(losses.curl_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask)))
        assert l_same < l_diff
        assert l_same < 0.05  # only the SSIM normalization keeps it nonzero

    def test_masked_pixels_ignored(self, rng):
        pred, tgt, mask = _batch(rng, mask_frac=0.7)
        base = float(losses.curl_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask)))
        # Perturbing only masked-out pixels must not change the loss.
        perturbed = pred + (1 - mask) * 0.5
        after = float(
            losses.curl_loss(jnp.asarray(np.clip(perturbed, 0, 1)), jnp.asarray(tgt), jnp.asarray(mask))
        )
        np.testing.assert_allclose(after, base, atol=1e-5)

    def test_differentiable(self, rng):
        import jax

        pred, tgt, mask = _batch(rng, h=32, w=32)
        g = jax.grad(
            lambda p: losses.curl_loss(p, jnp.asarray(tgt), jnp.asarray(mask))
        )(jnp.asarray(pred))
        assert np.isfinite(np.asarray(g)).all()
        # No gradient may leak through masked pixels' RGB/Lab/HSV L1 terms.
        assert float(jnp.abs(g * (1 - jnp.asarray(mask))).max()) < 1e-3


class TestPSNR:
    def test_known_value(self):
        a = jnp.zeros((1, 8, 8, 3))
        b = jnp.full((1, 8, 8, 3), 0.1)
        mask = jnp.ones((1, 8, 8, 1))
        # MSE = 0.01 -> PSNR = 20 dB.
        np.testing.assert_allclose(float(metrics.psnr(a, b, mask)), 20.0, atol=1e-4)

    def test_all_masked_is_nan_and_excluded(self, rng):
        pred, tgt, _ = _batch(rng, b=2, h=8, w=8)
        mask = np.ones((2, 8, 8, 1), np.float32)
        mask[1] = 0.0
        per_img = np.asarray(
            metrics.psnr_per_image(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask))
        )
        assert np.isfinite(per_img[0]) and np.isnan(per_img[1])
        mean = float(metrics.psnr(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask)))
        np.testing.assert_allclose(mean, per_img[0], rtol=1e-6)


@requires_reference
class TestReferenceParity:
    def test_curl_loss_parity(self, rng):
        import torch

        ref_model = load("model")
        criterion = ref_model.CURLLoss(ssim_window_size=5, num_channel=1)
        pred, tgt, mask = _batch(rng)
        with torch.no_grad():
            t_loss = criterion(
                torch.from_numpy(np.ascontiguousarray(pred.transpose(0, 3, 1, 2))),
                torch.from_numpy(np.ascontiguousarray(tgt.transpose(0, 3, 1, 2))),
                torch.from_numpy(np.ascontiguousarray(mask.transpose(0, 3, 1, 2))),
            ).item()
        j_loss = float(
            losses.curl_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask))
        )
        np.testing.assert_allclose(j_loss, t_loss, atol=2e-5)

    def test_curl_loss_parity_full_mask(self, rng):
        import torch

        ref_model = load("model")
        criterion = ref_model.CURLLoss()
        pred, tgt, _ = _batch(rng)
        mask = np.ones((2, 64, 64, 1), np.float32)
        with torch.no_grad():
            t_loss = criterion(
                torch.from_numpy(np.ascontiguousarray(pred.transpose(0, 3, 1, 2))),
                torch.from_numpy(np.ascontiguousarray(tgt.transpose(0, 3, 1, 2))),
                torch.from_numpy(np.ascontiguousarray(mask.transpose(0, 3, 1, 2))),
            ).item()
        j_loss = float(
            losses.curl_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask))
        )
        np.testing.assert_allclose(j_loss, t_loss, atol=2e-5)

    def test_psnr_parity(self, rng):
        import torch

        ref_metric = load("metric")
        pred, tgt, mask = _batch(rng)
        t_val = ref_metric.PSNRMetric()(
            torch.from_numpy(np.ascontiguousarray(tgt.transpose(0, 3, 1, 2))),
            torch.from_numpy(np.ascontiguousarray(pred.transpose(0, 3, 1, 2))),
            torch.from_numpy(np.ascontiguousarray(mask.transpose(0, 3, 1, 2))),
        ).item()
        j_val = float(metrics.psnr(jnp.asarray(tgt), jnp.asarray(pred), jnp.asarray(mask)))
        np.testing.assert_allclose(j_val, t_val, atol=1e-4)
