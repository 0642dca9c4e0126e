"""Color-conversion tests: colorimetric closed-form checks, round-trips, and
bit-level parity against the PyTorch reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from curl_tpu.ops import color

from reference_oracle import load, requires_reference


def _rand_img(rng, b=2, h=16, w=24):
    return rng.uniform(0.0, 1.0, size=(b, h, w, 3)).astype(np.float32)


class TestClosedForm:
    def test_white_maps_to_lab_white(self):
        img = jnp.ones((1, 2, 2, 3), jnp.float32)
        lab = color.rgb_to_lab(img)
        # L = 100 -> 1.0 after renormalization; a,b = 0 -> 0.5.
        np.testing.assert_allclose(lab[..., 0], 1.0, atol=2e-3)
        np.testing.assert_allclose(lab[..., 1], 0.5, atol=2e-3)
        np.testing.assert_allclose(lab[..., 2], 0.5, atol=2e-3)

    def test_gray_is_achromatic_in_lab(self):
        img = jnp.full((1, 2, 2, 3), 0.42, jnp.float32)
        lab = color.rgb_to_lab(img)
        np.testing.assert_allclose(lab[..., 1], 0.5, atol=2e-3)
        np.testing.assert_allclose(lab[..., 2], 0.5, atol=2e-3)

    def test_primary_hues(self):
        img = jnp.asarray(
            [[[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]]], jnp.float32
        )
        hsv = color.rgb_to_hsv(img)
        np.testing.assert_allclose(
            hsv[0, 0, :, 0], [1e-9, 1 / 3, 2 / 3], atol=1e-5
        )
        np.testing.assert_allclose(hsv[0, 0, :, 1], 1.0, atol=1e-5)  # full sat
        np.testing.assert_allclose(hsv[0, 0, :, 2], 1.0, atol=1e-5)  # full val

    def test_hsv_black_has_zero_sat(self):
        img = jnp.zeros((1, 1, 1, 3), jnp.float32)
        hsv = color.rgb_to_hsv(img)
        # Clamped to the 1e-9 floor, saturation ~0 (safe division semantics).
        assert float(hsv[0, 0, 0, 1]) <= 1e-6

    def test_lab_roundtrip(self, rng):
        img = _rand_img(rng)
        # Keep away from the gamut edge where clamps bite.
        img = 0.05 + 0.9 * img
        back = color.lab_to_rgb(color.rgb_to_lab(jnp.asarray(img)))
        np.testing.assert_allclose(np.asarray(back), img, atol=1e-3)

    def test_hsv_roundtrip(self, rng):
        img = 0.05 + 0.9 * _rand_img(rng)
        back = color.hsv_to_rgb(color.rgb_to_hsv(jnp.asarray(img)))
        np.testing.assert_allclose(np.asarray(back), img, atol=1e-3)

    def test_gradients_finite(self, rng):
        import jax

        img = jnp.asarray(_rand_img(rng, b=1, h=4, w=4))
        for fn in (color.rgb_to_lab, color.lab_to_rgb, color.rgb_to_hsv, color.hsv_to_rgb):
            g = jax.grad(lambda x: jnp.sum(fn(x)))(img)
            assert np.isfinite(np.asarray(g)).all(), fn.__name__


@requires_reference
class TestReferenceParity:
    """Bit-level fp32 parity with /root/reference/colors.py."""

    @pytest.fixture(scope="class")
    def torch_and_ref(self):
        import torch

        return torch, load("colors")

    def _compare(self, torch, ref_mod_instance, jax_fn, img_nhwc, atol):
        t_in = torch.from_numpy(np.ascontiguousarray(img_nhwc.transpose(0, 3, 1, 2)))
        with torch.no_grad():
            t_out = ref_mod_instance(t_in).numpy().transpose(0, 2, 3, 1)
        j_out = np.asarray(jax_fn(jnp.asarray(img_nhwc)))
        np.testing.assert_allclose(j_out, t_out, atol=atol, rtol=0)

    def test_rgb2lab(self, rng, torch_and_ref):
        torch, ref = torch_and_ref
        self._compare(torch, ref.RGB2LAB(), color.rgb_to_lab, _rand_img(rng), 5e-5)

    def test_lab2rgb(self, rng, torch_and_ref):
        torch, ref = torch_and_ref
        self._compare(torch, ref.LAB2RGB(), color.lab_to_rgb, _rand_img(rng), 2e-4)

    def test_rgb2hsv(self, rng, torch_and_ref):
        torch, ref = torch_and_ref
        self._compare(torch, ref.RGB2HSV(), color.rgb_to_hsv, _rand_img(rng), 1e-6)

    def test_hsv2rgb(self, rng, torch_and_ref):
        torch, ref = torch_and_ref
        self._compare(torch, ref.HSV2RGB(), color.hsv_to_rgb, _rand_img(rng), 1e-6)

    def test_hsv2rgb_edge_values(self, torch_and_ref):
        torch, ref = torch_and_ref
        # Hue exactly at sector boundaries, zero saturation, extremes.
        hues = np.array([0, 1 / 6, 2 / 6, 3 / 6, 4 / 6, 5 / 6, 1.0], np.float32)
        img = np.zeros((1, 7, 3, 3), np.float32)
        img[0, :, :, 0] = hues[:, None]
        img[0, :, :, 1] = [0.0, 0.5, 1.0]
        img[0, :, :, 2] = [1.0, 0.5, 0.0]
        self._compare(torch, ref.HSV2RGB(), color.hsv_to_rgb, img, 1e-6)

    def test_rgb2hsv_ties(self, torch_and_ref):
        torch, ref = torch_and_ref
        # Equal-channel ties exercise the additive argmax semantics.
        img = np.array(
            [[[[0.5, 0.5, 0.2], [0.3, 0.3, 0.3], [0.7, 0.2, 0.7]]]], np.float32
        )
        self._compare(torch, ref.RGB2HSV(), color.rgb_to_hsv, img, 1e-6)
