"""Inference-engine unit tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curl_tpu.infer.engine import Enhancer, center_crop, resize_shorter_side
from curl_tpu.models import TriSpacePolyNet


@pytest.fixture(scope="module")
def enhancer():
    net = TriSpacePolyNet(backbone="tiny")
    img = jnp.zeros((1, 32, 32, 3))
    mask = jnp.ones((1, 32, 32, 1))
    variables = net.init(jax.random.PRNGKey(0), img, mask)
    return Enhancer(net, variables, backbone_size=32)


class TestPreprocessing:
    def test_resize_shorter_side_landscape(self, rng):
        img = rng.uniform(size=(100, 200, 3)).astype(np.float32)
        out = resize_shorter_side(img, 50)
        assert out.shape == (50, 100, 3)

    def test_resize_shorter_side_portrait(self, rng):
        img = rng.uniform(size=(200, 100, 3)).astype(np.float32)
        out = resize_shorter_side(img, 50)
        assert out.shape == (100, 50, 3)

    def test_resize_mono(self, rng):
        img = (rng.uniform(size=(100, 200, 1)) > 0.5).astype(np.float32)
        out = resize_shorter_side(img, 50)
        assert out.shape == (50, 100, 1)

    def test_center_crop_exact_and_pad(self, rng):
        img = rng.uniform(size=(60, 80, 3)).astype(np.float32)
        assert center_crop(img, 40).shape == (40, 40, 3)
        assert center_crop(img, 100).shape == (100, 100, 3)  # pads


class TestEnhancer:
    def test_coefficients_shape(self, enhancer, rng):
        img = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
        mask = jnp.ones((2, 32, 32, 1), jnp.float32)
        r, l, h = enhancer.coefficients(img, mask)
        assert r.shape == l.shape == h.shape == (2, 3, 126)

    def test_white_background_matte(self, enhancer, rng):
        img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        mask = jnp.ones((1, 32, 32, 1), jnp.float32)
        target = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        tmask = jnp.zeros((1, 64, 64, 1), jnp.float32).at[:, 16:48, 16:48].set(1.0)
        out = enhancer.enhance_image(
            img, mask, target, tmask, white_background=True
        )
        # Background must be exactly white; foreground must not be.
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]), 1.0)
        assert float(jnp.abs(out[:, 16:48, 16:48] - 1.0).max()) > 0.01

    def test_batched_enhance_matches_per_image(self, enhancer, rng):
        img = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
        mask = jnp.ones((2, 32, 32, 1), jnp.float32)
        target = jnp.asarray(rng.uniform(0, 1, (2, 48, 48, 3)).astype(np.float32))
        both = enhancer.enhance_image(img, mask, target)
        one = enhancer.enhance_image(img[:1], mask[:1], target[:1])
        np.testing.assert_allclose(np.asarray(both[:1]), np.asarray(one), atol=1e-6)

    def test_enhance_stream_matches_enhance_image(self, enhancer, rng):
        """The pipelined stream must yield the same outputs, in order, as
        synchronous per-batch calls."""
        batches = []
        for i in range(5):
            img = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
            mask = jnp.ones((2, 32, 32, 1), jnp.float32)
            target = jnp.asarray(rng.uniform(0, 1, (2, 48, 48, 3)).astype(np.float32))
            batches.append((img, mask, target))
        streamed = list(enhancer.enhance_stream(iter(batches), max_in_flight=2))
        assert len(streamed) == len(batches)
        for out, (img, mask, target) in zip(streamed, batches):
            expect = enhancer.enhance_image(img, mask, target)
            np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-6)

    def test_u8_wire_format_matches_f32(self, enhancer, rng):
        """uint8 in / uint8 out must equal the fp32 path's saved bytes:
        inputs normalized in-program, output floor-quantized in-program
        exactly like utils.imageio.save_image_u8."""
        net, variables = enhancer.model, enhancer.variables
        u8 = Enhancer(net, variables, backbone_size=32, out_u8=True)
        img8 = rng.integers(0, 256, (2, 32, 32, 3)).astype(np.uint8)
        mask8 = np.ones((2, 32, 32, 1), np.uint8)
        tgt8 = rng.integers(0, 256, (2, 48, 48, 3)).astype(np.uint8)
        out8 = np.asarray(u8.enhance_image(img8, mask8, tgt8))
        assert out8.dtype == np.uint8
        f32 = np.asarray(
            enhancer.enhance_image(
                jnp.asarray(img8, jnp.float32) / 255.0,
                jnp.asarray(mask8, jnp.float32),
                jnp.asarray(tgt8, jnp.float32) / 255.0,
            )
        )
        expect = np.clip(f32 * 255.0, 0, 255).astype(np.uint8)
        # Floor quantization can flip a byte where fp32 lands exactly on an
        # integer boundary; require exactness except a tiny boundary set.
        diff = (out8.astype(np.int32) - expect.astype(np.int32)) != 0
        assert diff.mean() < 1e-3, diff.mean()
        assert np.abs(out8.astype(np.int32) - expect.astype(np.int32)).max() <= 1

    def test_bf16_target_wire_within_one_u8_lsb(self, enhancer, rng):
        """The bf16 target wire (the measured serving-throughput winner —
        docs/ROOFLINE.md round 5: 465 vs 405 img/s at 1080p batch 32) must
        stay within ~1 8-bit LSB of the fp32-wire output: bf16's rounding
        error on [0,1] pixels (half-ulp 2^-9..2^-8) is at or below uint8's
        own quantization step, and compute stays fp32 in-program."""
        tgt8 = rng.integers(0, 256, (2, 48, 48, 3)).astype(np.uint8)
        img = jnp.asarray(
            rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        )
        mask = jnp.ones((2, 32, 32, 1), jnp.float32)
        tgt_f32 = jnp.asarray(tgt8, jnp.float32) / 255.0
        out_f32 = np.asarray(enhancer.enhance_image(img, mask, tgt_f32))
        out_bf16 = np.asarray(
            enhancer.enhance_image(img, mask, tgt_f32.astype(jnp.bfloat16)),
            np.float32,
        )
        err = np.abs(out_bf16 - out_f32)
        assert err.max() <= 1.5 / 255.0, err.max()
        # ... and the u8-quantized bytes a server would emit differ by <=1.
        q32 = np.clip(out_f32 * 255.0, 0, 255).astype(np.int32)
        qbf = np.clip(out_bf16 * 255.0, 0, 255).astype(np.int32)
        assert np.abs(qbf - q32).max() <= 1

    def test_u8_white_matte(self, enhancer, rng):
        """White-background matte on the u8 path: masked-out pixels become
        exactly 255."""
        net, variables = enhancer.model, enhancer.variables
        u8 = Enhancer(net, variables, backbone_size=32, out_u8=True)
        img8 = rng.integers(0, 256, (1, 32, 32, 3)).astype(np.uint8)
        mask8 = np.ones((1, 32, 32, 1), np.uint8)
        tgt8 = rng.integers(0, 256, (1, 48, 48, 3)).astype(np.uint8)
        tmask = np.zeros((1, 48, 48, 1), np.uint8)
        tmask[:, :24] = 1
        out = np.asarray(
            u8.enhance_image(img8, mask8, tgt8, jnp.asarray(tmask), white_background=True)
        )
        assert out.dtype == np.uint8
        assert (out[:, 24:] == 255).all()
        assert not (out[:, :24] == 255).all()

    def test_curve_model_enhancer(self, rng):
        """CurlCurveNet serves through the same Enhancer (predict@small,
        apply@target, streaming, u8 wire); polynomial-only helpers raise."""
        from curl_tpu.models import CurlCurveNet

        net = CurlCurveNet(backbone="tiny")
        img = jnp.zeros((1, 32, 32, 3))
        mask = jnp.ones((1, 32, 32, 1))
        variables = net.init(jax.random.PRNGKey(0), img, mask)
        enh = Enhancer(net, variables, backbone_size=32)

        small = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
        smask = jnp.ones((2, 32, 32, 1), jnp.float32)
        target = jnp.asarray(rng.uniform(0, 1, (2, 48, 48, 3)).astype(np.float32))
        out = enh.enhance_image(small, smask, target)
        direct, _ = net.apply(variables, small, smask, target)
        np.testing.assert_allclose(np.asarray(out), np.asarray(direct), atol=1e-6)

        # 5e-6: the serve function closes the variables over, and the jit
        # constant-folds the knot path slightly differently; the 10-curve
        # chain amplifies the last-ulp difference.
        streamed = list(enh.enhance_stream(iter([(small, smask, target)])))
        np.testing.assert_allclose(np.asarray(streamed[0]), np.asarray(direct), atol=5e-6)

        with pytest.raises(NotImplementedError):
            enh.coefficients(small, smask)

    def test_enhance_stream_early_abandon(self, enhancer, rng):
        """Breaking out of the stream must not hang or leak the fetcher
        thread (the consumer closes the generator mid-pipeline)."""
        import threading

        def batches():
            while True:  # endless producer; consumer stops first
                img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
                mask = jnp.ones((1, 32, 32, 1), jnp.float32)
                target = jnp.asarray(rng.uniform(0, 1, (1, 48, 48, 3)).astype(np.float32))
                yield img, mask, target

        before = threading.active_count()
        gen = enhancer.enhance_stream(batches(), max_in_flight=4)
        got = [next(gen) for _ in range(3)]
        gen.close()  # runs the generator's finally
        assert len(got) == 3
        assert threading.active_count() <= before + 1  # fetcher joined

    def test_enhance_chained_matches_per_batch(self, enhancer, rng):
        """K-chained serving (one lax.scan program per K batches — the
        per-program-turnaround amortizer, docs/ROOFLINE.md) must produce
        exactly the per-batch programs' outputs, in order."""
        k = 3
        imgs = jnp.asarray(rng.uniform(0, 1, (k, 1, 32, 32, 3)).astype(np.float32))
        masks = jnp.ones((k, 1, 32, 32, 1), jnp.float32)
        targets = jnp.asarray(rng.uniform(0, 1, (k, 1, 48, 48, 3)).astype(np.float32))
        outs, probe = enhancer.enhance_chained(imgs, masks, targets)
        assert outs.shape == (k, 1, 48, 48, 3)
        for j in range(k):
            direct = enhancer.enhance_image(imgs[j], masks[j], targets[j])
            np.testing.assert_allclose(
                np.asarray(outs[j]), np.asarray(direct), atol=1e-6
            )
        np.testing.assert_allclose(float(probe), float(outs[0, 0, 0, 0, 0]))

    def test_enhance_stream_propagates_batch_errors(self, enhancer, rng):
        """A bad batch (wrong rank) must raise to the consumer, not hang."""
        img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        mask = jnp.ones((1, 32, 32, 1), jnp.float32)
        target = jnp.asarray(rng.uniform(0, 1, (1, 48, 48, 3)).astype(np.float32))
        batches = [(img, mask, target), (img, mask, target[0]), (img, mask, target)]
        with pytest.raises(Exception):
            list(enhancer.enhance_stream(iter(batches), max_in_flight=2))


class TestAutoTile:
    """Auto row-banding above the per-image HBM heuristic (VERDICT r3
    item 9): 8K single-image infer needs no flags; simulated here with a
    small bound so CPU tests stay cheap."""

    def test_auto_tile_rows_selection(self):
        from curl_tpu.infer.engine import AUTO_TILE_PIXELS, auto_tile_rows

        # Known-good whole-image sizes never tile at the default bound.
        assert auto_tile_rows(1080, 1920) is None            # 1080p
        assert auto_tile_rows(2160, 3840) is None            # 4K
        # 8K tiles, in sublane multiples, near the hardware-verified 1080.
        rows = auto_tile_rows(4320, 7680)
        assert rows is not None and rows % 32 == 0
        assert 512 <= rows <= 2176
        assert rows * 7680 <= AUTO_TILE_PIXELS
        # Tiny budget still yields a valid band.
        assert auto_tile_rows(100, 1 << 20, budget_px=1024) == 32

    def test_auto_tiled_matches_whole_image(self, enhancer, rng):
        img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        mask = jnp.ones((1, 32, 32, 1), jnp.float32)
        target = jnp.asarray(rng.uniform(0, 1, (1, 96, 64, 3)).astype(np.float32))
        whole = np.asarray(enhancer.enhance_image(img, mask, target))
        try:
            enhancer.auto_tile_pixels = 64 * 64  # force banding at 96x64
            called = {}
            orig = type(enhancer).residual

            def spy(self, *a, **kw):
                called["tile_rows"] = kw.get("tile_rows")
                return orig(self, *a, **kw)

            type(enhancer).residual = spy
            try:
                tiled = np.asarray(enhancer.enhance_image(img, mask, target))
            finally:
                type(enhancer).residual = orig
        finally:
            from curl_tpu.infer.engine import AUTO_TILE_PIXELS

            enhancer.auto_tile_pixels = AUTO_TILE_PIXELS
        assert called.get("tile_rows") == 32, "auto path must band the apply"
        np.testing.assert_allclose(tiled, whole, atol=2e-6)

    def test_auto_tiled_u8_wire(self, rng):
        """u8 in / u8 out through the banded path must match the fused
        whole-image u8 program byte-for-byte."""
        net = TriSpacePolyNet(backbone="tiny")
        img = jnp.zeros((1, 32, 32, 3))
        mask = jnp.ones((1, 32, 32, 1))
        variables = net.init(jax.random.PRNGKey(0), img, mask)
        enh = Enhancer(net, variables, backbone_size=32, out_u8=True)
        img_u8 = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3)).astype(np.uint8))
        mask_u8 = jnp.ones((1, 32, 32, 1), jnp.uint8)
        tgt_u8 = jnp.asarray(rng.integers(0, 256, (1, 96, 64, 3)).astype(np.uint8))
        whole = np.asarray(enh.enhance_image(img_u8, mask_u8, tgt_u8))
        assert whole.dtype == np.uint8
        enh.auto_tile_pixels = 64 * 64
        banded = np.asarray(enh.enhance_image(img_u8, mask_u8, tgt_u8))
        assert banded.dtype == np.uint8
        # Floor quantization can flip a byte where the float paths differ by
        # ~1e-6 across a quantization boundary; require byte-identical except
        # a vanishing fraction off by one.
        diff = np.abs(whole.astype(np.int32) - banded.astype(np.int32))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-3

    def test_pathological_aspect_ratios_warn(self, enhancer):
        """Fail-open cases must be LOUD (ADVICE r4): an over-budget image
        that row-banding can't shrink, and a width whose minimum 32-row
        band still overshoots the budget, both warn instead of silently
        dispatching an over-budget program."""
        import warnings as _w

        enhancer.auto_tile_pixels = 1024
        try:
            # Too short to band: 32x1024 > budget, min band >= height.
            with pytest.warns(RuntimeWarning, match="too short to row-band"):
                assert enhancer.needs_banding(32, 1024) is None
            # Bandable, but even one 32-row band overshoots the budget.
            with pytest.warns(RuntimeWarning, match="minimum 32-row band"):
                assert enhancer.needs_banding(128, 1024) == 32
            # In-budget images stay silent.
            with _w.catch_warnings():
                _w.simplefilter("error")
                assert enhancer.needs_banding(16, 16) is None
        finally:
            from curl_tpu.infer.engine import AUTO_TILE_PIXELS

            enhancer.auto_tile_pixels = AUTO_TILE_PIXELS
