"""SSIM / MS-SSIM tests: identity properties and parity with the reference
MSSSIMMetric (run on CPU with its hard-coded .cuda() calls neutralized)."""

import jax.numpy as jnp
import numpy as np
import pytest

import curl_tpu.ops.ssim as ssim_ops

from reference_oracle import load, requires_reference


class TestProperties:
    def test_identical_images_score_one(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32))
        s, cs = ssim_ops.ssim(img, img)
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cs), 1.0, atol=1e-4)
        ms = ssim_ops.ms_ssim(img, img)
        np.testing.assert_allclose(np.asarray(ms), 1.0, atol=1e-3)

    def test_noise_lowers_score(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32))
        noisy = jnp.clip(img + 0.3 * jnp.asarray(rng.normal(size=img.shape).astype(np.float32)), 0, 1)
        assert float(ssim_ops.ms_ssim(img, noisy)[0]) < float(ssim_ops.ms_ssim(img, img)[0])

    def test_matmul_blur_matches_depthwise(self, rng):
        """The MXU matmul form of the Gaussian blur is the same zero-padded
        convolution as the depthwise form — exact on CPU fp32."""
        img = jnp.asarray(rng.uniform(0, 1, (2, 48, 64, 5)).astype(np.float32))
        a = ssim_ops._matmul_blur(img, 11, 1.5)
        b = ssim_ops._depthwise_blur(img, 11, 1.5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    def test_avg_pool_odd_floor_semantics(self, rng):
        """Odd trailing row/col is dropped, matching torch F.avg_pool2d."""
        img = jnp.asarray(rng.uniform(0, 1, (1, 7, 9, 2)).astype(np.float32))
        out = np.asarray(ssim_ops._avg_pool_2x2(img))
        assert out.shape == (1, 3, 4, 2)
        ref = np.asarray(img)[:, :6, :8, :]
        ref = ref.reshape(1, 3, 2, 4, 2, 2).mean(axis=(2, 4))
        np.testing.assert_allclose(out, ref, atol=1e-7)

    def test_differentiable(self, rng):
        import jax

        img1 = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32))
        img2 = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32))
        g = jax.grad(lambda a: jnp.sum(ssim_ops.ms_ssim(a, img2)))(img1)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


@requires_reference
class TestReferenceParity:
    @pytest.mark.parametrize("channels", [1, 3])
    def test_msssim_parity(self, rng, channels):
        import torch

        ref = load("metric")
        metric = ref.MSSSIMMetric(window_size=11, num_channel=channels)
        img1 = rng.uniform(0, 1, (2, 64, 64, channels)).astype(np.float32)
        img2 = rng.uniform(0, 1, (2, 64, 64, channels)).astype(np.float32)
        with torch.no_grad():
            t_out = metric(
                torch.from_numpy(np.ascontiguousarray(img1.transpose(0, 3, 1, 2))),
                torch.from_numpy(np.ascontiguousarray(img2.transpose(0, 3, 1, 2))),
            ).numpy()
        j_out = np.asarray(ssim_ops.ms_ssim(jnp.asarray(img1), jnp.asarray(img2)))
        np.testing.assert_allclose(j_out, t_out, atol=1e-5, rtol=1e-5)

    def test_ssim_parity_window5(self, rng):
        import torch

        ref = load("metric")
        metric = ref.MSSSIMMetric(window_size=5, num_channel=1)
        img1 = rng.uniform(0, 1, (1, 40, 40, 1)).astype(np.float32)
        img2 = rng.uniform(0, 1, (1, 40, 40, 1)).astype(np.float32)
        with torch.no_grad():
            t_s, t_cs = metric.compute_ssim(
                torch.from_numpy(np.ascontiguousarray(img1.transpose(0, 3, 1, 2))),
                torch.from_numpy(np.ascontiguousarray(img2.transpose(0, 3, 1, 2))),
            )
        j_s, j_cs = ssim_ops.ssim(jnp.asarray(img1), jnp.asarray(img2), window_size=5)
        np.testing.assert_allclose(np.asarray(j_s), t_s.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(j_cs), t_cs.numpy(), atol=1e-5)
