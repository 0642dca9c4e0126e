"""Export-layer tests: torch checkpoint conversion round-trip and StableHLO
export/reload."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curl_tpu.export import stablehlo, torch_convert
from curl_tpu.models import TriSpacePolyNet
from curl_tpu.models import backbone as bb


@pytest.fixture(scope="module")
def tiny_variables():
    net = TriSpacePolyNet(backbone="tiny")
    img = jnp.zeros((1, 32, 32, 3))
    mask = jnp.ones((1, 32, 32, 1))
    return net, net.init(jax.random.PRNGKey(0), img, mask)


class TestTorchConvert:
    def test_roundtrip_preserves_forward(self, tiny_variables, rng):
        """export -> torch-style dict -> convert back must reproduce the
        exact same forward output."""
        net, variables = tiny_variables
        sd = torch_convert.export_trispace_state_dict(variables, bb.TINY)
        assert "backbone.conv_stem.weight" in sd
        assert sd["backbone.conv_stem.weight"].shape[0] == bb.TINY.stem_channels  # OIHW

        restored = torch_convert.convert_trispace_state_dict(
            sd, backbone_cfg=bb.TINY, polynomial_order=4, num_in=5
        )
        img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        mask = jnp.ones((1, 32, 32, 1), jnp.float32)
        out_orig = net.apply(variables, img, mask)
        out_conv = net.apply(restored, img, mask)
        np.testing.assert_allclose(np.asarray(out_conv), np.asarray(out_orig), atol=1e-6)

    def test_ddp_prefix_stripped(self, tiny_variables):
        net, variables = tiny_variables
        sd = torch_convert.export_trispace_state_dict(variables, bb.TINY)
        wrapped = {"module." + k: v for k, v in sd.items()}
        restored = torch_convert.convert_trispace_state_dict(
            wrapped, backbone_cfg=bb.TINY
        )
        assert "backbone_net" in restored["params"]

    def test_missing_keys_reported(self, tiny_variables):
        net, variables = tiny_variables
        sd = torch_convert.export_trispace_state_dict(variables, bb.TINY)
        del sd["backbone.conv_stem.weight"]
        del sd["backbone.bn2.running_mean"]
        with pytest.raises(ValueError, match="conv_stem"):
            torch_convert.convert_trispace_state_dict(sd, backbone_cfg=bb.TINY)

    def test_unexpected_keys_reported(self, tiny_variables):
        net, variables = tiny_variables
        sd = torch_convert.export_trispace_state_dict(variables, bb.TINY)
        sd["backbone.blocks.9.9.conv.weight"] = np.zeros((1, 1, 1, 1), np.float32)
        with pytest.raises(ValueError, match="unconsumed"):
            torch_convert.convert_trispace_state_dict(sd, backbone_cfg=bb.TINY)

    def test_powers_buffer_validated(self, tiny_variables):
        from curl_tpu.ops import poly

        net, variables = tiny_variables
        sd = torch_convert.export_trispace_state_dict(variables, bb.TINY)
        sd["polylayer.powers"] = poly.powers_array(4, 5).astype(np.float32)
        torch_convert.convert_trispace_state_dict(sd, backbone_cfg=bb.TINY)  # ok
        sd["polylayer.powers"] = sd["polylayer.powers"][::-1].copy()
        with pytest.raises(ValueError, match="powers"):
            torch_convert.convert_trispace_state_dict(sd, backbone_cfg=bb.TINY)


class TestStableHLO:
    def test_export_save_load_run(self, tiny_variables, rng, tmp_path):
        net, variables = tiny_variables
        exported = stablehlo.export_enhancer(net, variables, backbone_size=32)
        assert "stablehlo" in stablehlo.stablehlo_text(exported)

        path = str(tmp_path / "enhancer.stablehlo")
        stablehlo.save(exported, path)
        reloaded = stablehlo.load(path)

        img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        mask = jnp.ones((1, 32, 32, 1), jnp.float32)
        # Variable target dims: run the same artifact at two resolutions.
        for h, w in [(48, 40), (64, 72)]:
            target = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
            out = reloaded.call(img, mask, target)
            direct = net.apply(variables, img, mask, target)
            np.testing.assert_allclose(np.asarray(out), np.asarray(direct), atol=1e-5)


class TestStableHLOCurveModel:
    def test_curve_model_exports_and_runs(self, rng, tmp_path):
        """The knot-curve model exports through the same deployment-artifact
        path (its (image, regulariser) tuple output is reduced to the
        image)."""
        import jax

        from curl_tpu.models import CurlCurveNet

        net = CurlCurveNet(backbone="tiny")
        img = jnp.zeros((1, 32, 32, 3))
        mask = jnp.ones((1, 32, 32, 1))
        variables = net.init(jax.random.PRNGKey(0), img, mask)
        exported = stablehlo.export_enhancer(
            net, variables, backbone_size=32, variable_target=False
        )
        path = str(tmp_path / "curve.stablehlo")
        stablehlo.save(exported, path)
        reloaded = stablehlo.load(path)
        x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        out = reloaded.call(x, mask, x)
        direct, _ = net.apply(variables, x, mask, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(direct), atol=1e-5)


class TestTFLite:
    def test_export_and_run_outside_jax(self, tiny_variables, rng, tmp_path):
        """The deployment artifact: jax2tf -> TFLite flatbuffer, executed by
        the TFLite interpreter with no jax in the loop, matching the direct
        jax forward — the analog of the reference's CoreML convert + smoke
        predict (coreml_conversion.py:30-43)."""
        tf = pytest.importorskip("tensorflow")
        del tf
        from curl_tpu.export import tflite as tflite_lib

        net, variables = tiny_variables
        path = str(tmp_path / "enhancer.tflite")
        tflite_lib.export_tflite(
            net, variables, path, backbone_size=32, target_hw=(48, 40)
        )
        assert os.path.getsize(path) > 1000

        img = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
        mask = np.ones((1, 32, 32, 1), np.float32)
        target = rng.uniform(0, 1, (1, 48, 40, 3)).astype(np.float32)
        got = tflite_lib.run_tflite(path, img, mask, target)
        direct = np.asarray(net.apply(variables, jnp.asarray(img), jnp.asarray(mask), jnp.asarray(target)))
        assert got.shape == direct.shape
        np.testing.assert_allclose(got, direct, atol=5e-5)

    def test_multi_resolution_bundle(self, tiny_variables, rng, tmp_path):
        """`export_tflite_bundle` writes one artifact per serving resolution
        plus a manifest, each runnable by the interpreter — the mobile role
        of the reference's variable-resolution CoreML artifact
        (coreml_conversion.py:33). A true dynamic-dims TFLite artifact is
        not producible with this toolchain (see export/tflite.py)."""
        import json

        pytest.importorskip("tensorflow")
        from curl_tpu.export import tflite as tflite_lib

        net, variables = tiny_variables
        stem = str(tmp_path / "enhancer")
        hws = [(48, 40), (64, 48)]
        manifest_path = tflite_lib.export_tflite_bundle(
            net, variables, stem, backbone_size=32, target_hws=hws,
            extra_meta={"model": "trispace"},
        )
        with open(manifest_path) as f:
            manifest = json.load(f)
        assert manifest["format"] == "tflite-bundle"
        assert manifest["model"] == "trispace"
        assert [(a["target_h"], a["target_w"]) for a in manifest["artifacts"]] == hws

        img = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
        mask = np.ones((1, 32, 32, 1), np.float32)
        for a in manifest["artifacts"]:
            path = str(tmp_path / a["file"])
            assert os.path.getsize(path) > 1000
            target = rng.uniform(
                0, 1, (1, a["target_h"], a["target_w"], 3)
            ).astype(np.float32)
            got = tflite_lib.run_tflite(path, img, mask, target)
            direct = np.asarray(net.apply(
                variables, jnp.asarray(img), jnp.asarray(mask), jnp.asarray(target)
            ))
            np.testing.assert_allclose(got, direct, atol=5e-5)

    def test_curve_model_tflite_single_output(self, rng, tmp_path):
        """CurlCurveNet's (image, regulariser) tuple must be unwrapped in the
        TFLite artifact: one output tensor, matching the direct forward
        (round-3 ADVICE: the raw tuple produced a two-output artifact that
        crashed the CLI smoke test)."""
        pytest.importorskip("tensorflow")
        import jax

        from curl_tpu.export import tflite as tflite_lib
        from curl_tpu.models import CurlCurveNet

        net = CurlCurveNet(backbone="tiny")
        img0 = jnp.zeros((1, 32, 32, 3))
        mask = np.ones((1, 32, 32, 1), np.float32)
        variables = net.init(jax.random.PRNGKey(0), img0, jnp.asarray(mask))
        path = str(tmp_path / "curve.tflite")
        tflite_lib.export_tflite(
            net, variables, path, backbone_size=32, target_hw=(48, 40)
        )
        img = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
        target = rng.uniform(0, 1, (1, 48, 40, 3)).astype(np.float32)
        got = tflite_lib.run_tflite(path, img, mask, target)  # asserts 1 output
        direct, _ = net.apply(
            variables, jnp.asarray(img), jnp.asarray(mask), jnp.asarray(target)
        )
        np.testing.assert_allclose(got, np.asarray(direct), atol=5e-5)
