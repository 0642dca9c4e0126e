"""Pallas fused-kernel tests (interpret mode on CPU) and plane-math
equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from curl_tpu.ops import color, color_planes, enhance
from curl_tpu.ops.pallas import fused_trispace_residual


def _coeffs(rng, b=1, n=126):
    return [
        jnp.asarray(rng.normal(scale=0.2, size=(b, 3, n)).astype(np.float32))
        for _ in range(3)
    ]


class TestColorPlanes:
    @pytest.mark.parametrize(
        "plane_fn,nhwc_fn",
        [
            (color_planes.lab_from_rgb, color.rgb_to_lab),
            (color_planes.rgb_from_lab, color.lab_to_rgb),
            (color_planes.hsv_from_rgb, color.rgb_to_hsv),
            (color_planes.rgb_from_hsv, color.hsv_to_rgb),
        ],
    )
    def test_matches_nhwc(self, rng, plane_fn, nhwc_fn):
        img = rng.uniform(0, 1, (2, 8, 16, 3)).astype(np.float32)
        planes = plane_fn(*(jnp.asarray(img[..., i]) for i in range(3)))
        stacked = np.stack([np.asarray(p) for p in planes], axis=-1)
        expected = np.asarray(nhwc_fn(jnp.asarray(img)))
        np.testing.assert_allclose(stacked, expected, atol=1e-5)


class TestFusedKernel:
    def test_matches_xla_path(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, (2, 24, 40, 3)).astype(np.float32))
        cs = _coeffs(rng, b=2)
        ref = enhance.trispace_residual(img, *cs, impl="xla")
        with pltpu.force_tpu_interpret_mode():
            got = fused_trispace_residual(img, *cs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_non_spatial(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
        cs = _coeffs(rng, n=35)
        ref = enhance.trispace_residual(img, *cs, spatial=False, impl="xla")
        with pltpu.force_tpu_interpret_mode():
            got = fused_trispace_residual(img, *cs, spatial=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_row_band_tile(self, rng):
        """Kernel with a tile offset must reproduce the corresponding band
        of the whole-image result."""
        img = jnp.asarray(rng.uniform(0, 1, (1, 64, 48, 3)).astype(np.float32))
        cs = _coeffs(rng)
        with pltpu.force_tpu_interpret_mode():
            whole = fused_trispace_residual(img, *cs)
            band = fused_trispace_residual(
                img[:, 16:48], *cs, tile=(16, 0, 64, 48)
            )
        np.testing.assert_allclose(
            np.asarray(band), np.asarray(whole)[:, 16:48], atol=1e-6
        )

    def test_odd_sizes_pad_correctly(self, rng):
        # 17x23 = 391 pixels, far from a multiple of 4096.
        img = jnp.asarray(rng.uniform(0, 1, (1, 17, 23, 3)).astype(np.float32))
        cs = _coeffs(rng)
        ref = enhance.trispace_residual(img, *cs, impl="xla")
        with pltpu.force_tpu_interpret_mode():
            got = fused_trispace_residual(img, *cs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)

    def test_bad_coeff_shape_raises(self, rng):
        img = jnp.zeros((1, 16, 16, 3))
        good = _coeffs(rng)
        bad = jnp.zeros((1, 3, 100))
        with pytest.raises(ValueError, match="coeff_lab"):
            fused_trispace_residual(img, good[0], bad, good[2])

    def test_column_tiling_rejected(self, rng):
        img = jnp.zeros((1, 16, 16, 3))
        cs = _coeffs(rng)
        with pytest.raises(NotImplementedError):
            fused_trispace_residual(img, *cs, tile=(0, 8, 16, 32))

    def test_row_chunked_calls_match_xla(self, rng, monkeypatch):
        """An image whose grid exceeds MAX_BLOCKS_PER_CALL is split into
        several bounded pallas_calls inside one program; the chunk flat-
        pixel offsets must keep the coordinate planes globally correct."""
        from curl_tpu.ops.pallas import trispace_kernel as tk

        monkeypatch.setattr(tk, "MAX_BLOCKS_PER_CALL", 1)
        # 64x256 = 16384 px = 4 blocks at SUBLANES=32 -> 4 chunked calls,
        # with a chunk boundary mid-row (4096 px = 16 rows of 256).
        img = jnp.asarray(rng.uniform(0, 1, (1, 64, 256, 3)).astype(np.float32))
        cs = _coeffs(rng)
        ref = enhance.trispace_residual(img, *cs, impl="xla")
        with pltpu.force_tpu_interpret_mode():
            got = fused_trispace_residual(img, *cs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)

    def test_composite_mode_matches_generate_image(self, rng):
        """composite=True must equal clip(img + residual) of the XLA path,
        and trispace_enhance must dispatch to it."""
        img = jnp.asarray(rng.uniform(0, 1, (2, 24, 40, 3)).astype(np.float32))
        cs = _coeffs(rng, b=2)
        ref = enhance.generate_image(
            img, enhance.trispace_residual(img, *cs, impl="xla")
        )
        with pltpu.force_tpu_interpret_mode():
            got = fused_trispace_residual(img, *cs, composite=True)
            via_api = enhance.trispace_enhance(img, *cs, impl="pallas")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)
        np.testing.assert_allclose(np.asarray(via_api), np.asarray(ref), atol=5e-5)

    def test_composite_gradients_flow(self, rng):
        img = jnp.asarray(rng.uniform(0.2, 0.8, (1, 16, 16, 3)).astype(np.float32))
        cs = _coeffs(rng)

        def loss(coeffs):
            with pltpu.force_tpu_interpret_mode():
                out = fused_trispace_residual(img, *coeffs, composite=True)
            return jnp.sum(out)

        grads = jax.grad(loss)(tuple(cs))
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()
            assert float(jnp.abs(g).max()) > 0

    def test_row_chunked_band_tile(self, rng, monkeypatch):
        """Chunking composes with dynamic band tiling: global y must include
        both the band offset and the intra-image chunk offset."""
        from curl_tpu.ops.pallas import trispace_kernel as tk

        monkeypatch.setattr(tk, "MAX_BLOCKS_PER_CALL", 1)
        img = jnp.asarray(rng.uniform(0, 1, (1, 96, 256, 3)).astype(np.float32))
        cs = _coeffs(rng)
        with pltpu.force_tpu_interpret_mode():
            whole = fused_trispace_residual(img, *cs)
            band = fused_trispace_residual(
                img[:, 32:96], *cs, tile=(32, 0, 96, 256)
            )
        np.testing.assert_allclose(
            np.asarray(band), np.asarray(whole)[:, 32:96], atol=1e-6
        )


class TestFusedCurveKernel:
    def _inputs(self, rng, b=2, h=24, w=40):
        img = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
        mask = jnp.asarray((rng.uniform(size=(b, h, w, 1)) < 0.9).astype(np.float32))
        kl = jnp.asarray(rng.normal(scale=0.05, size=(b, 48)).astype(np.float32))
        kr = jnp.asarray(rng.normal(scale=0.05, size=(b, 48)).astype(np.float32))
        kh = jnp.asarray(rng.normal(scale=0.05, size=(b, 64)).astype(np.float32))
        return img, mask, kl, kr, kh

    def test_matches_xla_layer(self, rng):
        from curl_tpu.models.curl_curve import curl_curve_layer

        img, mask, kl, kr, kh = self._inputs(rng)
        ref, reg_ref = curl_curve_layer(img, mask, kl, kr, kh, impl="xla")
        with pltpu.force_tpu_interpret_mode():
            got, reg_got = curl_curve_layer(img, mask, kl, kr, kh, impl="pallas")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)
        np.testing.assert_allclose(np.asarray(reg_got), np.asarray(reg_ref), atol=1e-5)

    def test_gradients_through_custom_vjp(self, rng):
        from curl_tpu.models.curl_curve import curl_curve_layer

        img, mask, kl, kr, kh = self._inputs(rng, b=1, h=16, w=16)

        def loss(params):
            kl_, kr_, kh_ = params
            with pltpu.force_tpu_interpret_mode():
                out, reg = curl_curve_layer(img, mask, kl_, kr_, kh_, impl="pallas")
            return jnp.sum(out) + jnp.sum(reg)

        grads = jax.grad(loss)((kl, kr, kh))
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()
            assert float(jnp.abs(g).max()) > 0

    def test_odd_size_padding(self, rng):
        from curl_tpu.models.curl_curve import curl_curve_layer

        img, mask, kl, kr, kh = self._inputs(rng, b=1, h=17, w=23)
        ref, _ = curl_curve_layer(img, mask, kl, kr, kh, impl="xla")
        with pltpu.force_tpu_interpret_mode():
            got, _ = curl_curve_layer(img, mask, kl, kr, kh, impl="pallas")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)

    def test_row_chunked_calls_match_xla(self, rng, monkeypatch):
        from curl_tpu.models.curl_curve import curl_curve_layer
        from curl_tpu.ops.pallas import curve_kernel as ck

        monkeypatch.setattr(ck, "MAX_BLOCKS_PER_CALL", 1)
        img, mask, kl, kr, kh = self._inputs(rng, b=1, h=64, w=256)  # 4 blocks
        ref, _ = curl_curve_layer(img, mask, kl, kr, kh, impl="xla")
        with pltpu.force_tpu_interpret_mode():
            got, _ = curl_curve_layer(img, mask, kl, kr, kh, impl="pallas")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


class TestBF16Apply:
    def test_bf16_target_through_both_impls(self, rng):
        """4K-style bf16-activation apply: both impls accept bf16 images and
        compute in fp32 internally. Note the transform is *inherently*
        discontinuous in hue (channel-tie argmax), so a handful of pixels can
        diverge under input quantization — the checks are tight impl
        agreement plus small 99th-percentile error vs fp32."""
        img32 = jnp.asarray(rng.uniform(0, 1, (1, 64, 128, 3)).astype(np.float32))
        img16 = img32.astype(jnp.bfloat16)
        cs = _coeffs(rng)
        ref = enhance.trispace_residual(img32, *cs, impl="xla")
        xla16 = enhance.trispace_residual(img16, *cs, impl="xla")
        assert xla16.dtype == jnp.bfloat16
        err = np.abs(np.asarray(xla16.astype(jnp.float32)) - np.asarray(ref))
        assert np.quantile(err, 0.99) < 0.05, np.quantile(err, 0.99)
        with pltpu.force_tpu_interpret_mode():
            pl16 = fused_trispace_residual(img16, *cs)
        assert pl16.dtype == jnp.bfloat16
        # Both impls see the same quantized input -> near-exact agreement.
        agree = np.abs(
            np.asarray(pl16.astype(jnp.float32)) - np.asarray(xla16.astype(jnp.float32))
        )
        assert agree.max() < 0.01, agree.max()
