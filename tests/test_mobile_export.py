"""Mobile-bundle export: TFLite coefficient predictor + generated portable C
apply kernel — the any-resolution deployment artifact (role of the
reference's RangeDim CoreML export, coreml_conversion.py:30-37).

The C kernel is compiled with the host toolchain and pinned against the jax
tri-space apply at multiple odd resolutions with the SAME coefficients —
the property the reference's variable-dims artifact provided.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curl_tpu.export import mobile
from curl_tpu.models import TriSpacePolyNet
from curl_tpu.ops import enhance, poly


@pytest.fixture(scope="module")
def tiny_variables():
    net = TriSpacePolyNet(backbone="tiny")
    img = jnp.zeros((1, 32, 32, 3))
    mask = jnp.ones((1, 32, 32, 1))
    return net, net.init(jax.random.PRNGKey(0), img, mask)


@pytest.fixture(scope="module")
def apply_lib(tmp_path_factory):
    """Generated degree-4 spatial apply kernel, compiled once per module."""
    td = tmp_path_factory.mktemp("mobile")
    c_path = str(td / "curl_apply.c")
    with open(c_path, "w") as f:
        f.write(mobile.generate_apply_c(degree=4, spatial=True))
    return mobile.compile_apply(c_path)


def _rand_coeffs(rng, n, scale=0.4):
    return (rng.standard_normal((3, 3, n)) * scale).astype(np.float32)


class TestApplyKernel:
    def test_matches_jax_trispace_enhance(self, apply_lib, rng):
        """Compiled C output == jax `trispace_enhance` on the same image and
        coefficients (fp32, odd non-tile-aligned resolution)."""
        n = poly.num_monomials(4, 5)
        coeffs = _rand_coeffs(rng, n)
        img = rng.uniform(0, 1, (37, 61, 3)).astype(np.float32)
        got = mobile.run_apply(apply_lib, img, coeffs)
        want = np.asarray(
            enhance.trispace_enhance(
                jnp.asarray(img[None]),
                jnp.asarray(coeffs[0][None]),
                jnp.asarray(coeffs[1][None]),
                jnp.asarray(coeffs[2][None]),
            )
        )[0]
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_any_resolution_same_artifact(self, apply_lib, rng):
        """One compiled kernel serves multiple resolutions (including
        extreme aspect ratios) with the same coefficients — the RangeDim
        capability."""
        n = poly.num_monomials(4, 5)
        coeffs = _rand_coeffs(rng, n)
        for h, w in [(8, 200), (113, 29), (64, 64)]:
            img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
            got = mobile.run_apply(apply_lib, img, coeffs)
            want = np.asarray(
                enhance.trispace_enhance(
                    jnp.asarray(img[None]),
                    jnp.asarray(coeffs[0][None]),
                    jnp.asarray(coeffs[1][None]),
                    jnp.asarray(coeffs[2][None]),
                )
            )[0]
            np.testing.assert_allclose(got, want, atol=1e-5, err_msg=f"{h}x{w}")

    def test_adversarial_pixels(self, apply_lib, rng):
        """Exact 0/1 channels, gray pixels (zero chroma) and channel ties —
        the HSV guard/tie paths — match jax."""
        n = poly.num_monomials(4, 5)
        coeffs = _rand_coeffs(rng, n)
        px = np.array(
            [
                [[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.5, 0.5, 0.5]],
                [[1.0, 0.0, 0.0], [0.7, 0.7, 0.1], [0.3, 0.6, 0.6]],
                [[0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 1.0, 0.0]],
            ],
            dtype=np.float32,
        )
        got = mobile.run_apply(apply_lib, px, coeffs)
        want = np.asarray(
            enhance.trispace_enhance(
                jnp.asarray(px[None]),
                jnp.asarray(coeffs[0][None]),
                jnp.asarray(coeffs[1][None]),
                jnp.asarray(coeffs[2][None]),
            )
        )[0]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_nonspatial_codegen_compiles(self, tmp_path, rng):
        """degree-2 non-spatial variant: the generator is not hard-coded to
        the flagship configuration."""
        c_path = str(tmp_path / "apply2.c")
        with open(c_path, "w") as f:
            f.write(mobile.generate_apply_c(degree=2, spatial=False))
        lib = mobile.compile_apply(c_path)
        n = poly.num_monomials(2, 3)
        coeffs = _rand_coeffs(rng, n)
        img = rng.uniform(0, 1, (9, 13, 3)).astype(np.float32)
        got = mobile.run_apply(lib, img, coeffs)
        want = np.asarray(
            enhance.trispace_enhance(
                jnp.asarray(img[None]),
                jnp.asarray(coeffs[0][None]),
                jnp.asarray(coeffs[1][None]),
                jnp.asarray(coeffs[2][None]),
                degree=2,
                spatial=False,
            )
        )[0]
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestPredictorAndBundle:
    def test_predictor_tflite_matches_jax(self, tiny_variables, rng, tmp_path):
        pytest.importorskip("tensorflow")
        net, variables = tiny_variables
        path = str(tmp_path / "pred.tflite")
        mobile.export_predictor_tflite(net, variables, path, backbone_size=32)
        img = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
        mask = np.ones((1, 32, 32, 1), np.float32)
        got = mobile.run_predictor_tflite(path, img, mask)
        r, l, h = net.apply(
            variables, jnp.asarray(img), jnp.asarray(mask),
            method=TriSpacePolyNet.generate_coefficients,
        )
        want = np.asarray(jnp.stack([r, l, h], axis=1))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_bundle_end_to_end(self, tiny_variables, tmp_path):
        """Full artifact set: predictor tflite + C apply + manifest; smoke
        runs TFLite -> compiled C at two odd resolutions vs the jax
        forward — no jax at serve time."""
        pytest.importorskip("tensorflow")
        net, variables = tiny_variables
        stem = str(tmp_path / "bundle")
        manifest_path = mobile.export_mobile_bundle(
            net, variables, stem, backbone_size=32,
            extra_meta={"model": "trispace"},
        )
        with open(manifest_path) as f:
            manifest = json.load(f)
        assert manifest["format"] == "mobile-bundle"
        assert manifest["num_coeffs"] == poly.num_monomials(4, 5)
        assert os.path.getsize(f"{stem}_predictor.tflite") > 1000
        assert os.path.getsize(f"{stem}_apply.c") > 1000
        worst = mobile.smoke_test_bundle(
            net, variables, stem, backbone_size=32,
            target_hws=((23, 41), (52, 17)),
        )
        assert worst < 2e-3
