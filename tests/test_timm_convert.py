"""Pretrained-backbone import: raw timm ImageNet state_dict -> curl_tpu.

The reference trains from timm `efficientnetv2_rw_t` with `pretrained=True`
(reference model.py:456). timm is not installed here, so the expected
state_dict key/shape inventory is PINNED as committed JSON fixtures
(tests/fixtures/timm_*_keys.json) — if this backbone or the converter ever
drifts from the real timm topology, the fixture comparison fails in CI
rather than at a user's conversion time. The fixtures' parameter totals
match timm's published counts (rw_t 13.65M, rw_s 23.94M incl. classifier).
"""

import json
import os

import numpy as np
import pytest

import jax

from curl_tpu.export import torch_convert as tc
from curl_tpu.models import TriSpacePolyNet
from curl_tpu.models import backbone as bb

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _load_fixture(name: str) -> dict[str, tuple[int, ...]]:
    with open(os.path.join(FIXTURE_DIR, f"timm_{name}_keys.json")) as f:
        return {k: tuple(v) for k, v in json.load(f).items()}


def _synthetic_sd(shapes: dict[str, tuple[int, ...]], seed: int = 0) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    sd = {}
    for k, shape in shapes.items():
        if k.endswith("num_batches_tracked"):
            sd[k] = np.asarray(100, np.int64)
        elif k.endswith("running_var"):
            sd[k] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
        else:
            sd[k] = rng.normal(0, 0.05, shape).astype(np.float32)
    return sd


class TestFixturePin:
    @pytest.mark.parametrize("name", ["efficientnetv2_rw_t", "efficientnetv2_rw_s"])
    def test_key_shapes_match_pinned_fixture(self, name):
        """Derived inventory == committed fixture, key-for-key and
        shape-for-shape. A drift in stage tables, SE reduction, or head
        layout changes the derived inventory and fails here."""
        derived = tc.timm_key_shapes(bb.CONFIGS[name])
        pinned = _load_fixture(name)
        assert set(derived) == set(pinned)
        for k in pinned:
            assert derived[k] == pinned[k], f"{k}: {derived[k]} != {pinned[k]}"

    def test_param_totals_match_timm_published(self):
        """timm publishes 13.6M (rw_t) / 23.9M (rw_s) total params."""
        for name, published_m in (("efficientnetv2_rw_t", 13.6), ("efficientnetv2_rw_s", 23.9)):
            shapes = tc.timm_key_shapes(bb.CONFIGS[name])
            total = sum(
                int(np.prod(s)) for k, s in shapes.items()
                if not k.endswith(("num_batches_tracked", "running_mean", "running_var"))
            )
            assert abs(total / 1e6 - published_m) < 0.1, (name, total)


class TestTimmBackboneConvert:
    @pytest.mark.parametrize("name", ["efficientnetv2_rw_t", "efficientnetv2_rw_s"])
    def test_converter_consumes_fixture_exactly(self, name):
        """A synthetic state_dict built from the pinned fixture converts with
        zero missing/unexpected keys, and every converted array's shape
        matches the flax model's own initialization (via eval_shape — the
        full rw_t init is too slow for the 1-core CI host)."""
        import flax

        cfg = bb.CONFIGS[name]
        sd = _synthetic_sd(_load_fixture(name))
        variables = tc.convert_timm_backbone_state_dict(sd, cfg)

        model = TriSpacePolyNet(backbone=name)
        abstract = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                np.zeros((1, 64, 64, 3), np.float32),
                np.ones((1, 64, 64, 1), np.float32),
            )
        )
        for col in ("params", "batch_stats"):
            got = flax.traverse_util.flatten_dict(variables[col]["backbone_net"], sep="/")
            exp = flax.traverse_util.flatten_dict(abstract[col]["backbone_net"], sep="/")
            assert set(got) == set(exp), (
                f"{col}: extra={sorted(set(got) - set(exp))[:5]} "
                f"missing={sorted(set(exp) - set(got))[:5]}"
            )
            for k in exp:
                assert tuple(np.shape(got[k])) == tuple(exp[k].shape), (col, k)

    def test_shape_drift_raises(self):
        cfg = bb.CONFIGS["efficientnetv2_rw_t"]
        sd = _synthetic_sd(_load_fixture("efficientnetv2_rw_t"))
        sd["conv_stem.weight"] = np.zeros((32, 3, 3, 3), np.float32)  # wrong width
        with pytest.raises(ValueError, match="shape mismatch conv_stem.weight"):
            tc.convert_timm_backbone_state_dict(sd, cfg)

    def test_unexpected_key_raises(self):
        cfg = bb.CONFIGS["efficientnetv2_rw_t"]
        sd = _synthetic_sd(_load_fixture("efficientnetv2_rw_t"))
        sd["blocks.9.0.conv.weight"] = np.zeros((8, 8, 3, 3), np.float32)
        with pytest.raises(ValueError, match="unconsumed timm keys"):
            tc.convert_timm_backbone_state_dict(sd, cfg)

    def test_nested_state_dict_unwraps(self):
        cfg = bb.CONFIGS["efficientnetv2_rw_t"]
        sd = {"state_dict": _synthetic_sd(_load_fixture("efficientnetv2_rw_t"))}
        variables = tc.convert_timm_backbone_state_dict(sd, cfg)
        assert "backbone_net" in variables["params"]


class TestPretrainedInit:
    def test_graft_and_apply_tiny(self):
        """End-to-end on the tiny config: init fresh, graft synthetic timm
        weights, check the backbone subtree took the converted values, the
        head stayed fresh, and apply() runs."""
        import flax

        model = TriSpacePolyNet(backbone="tiny")
        shapes = tc.timm_key_shapes(bb.TINY)
        sd = _synthetic_sd(shapes, seed=3)
        img = np.random.default_rng(0).uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
        mask = np.ones((1, 32, 32, 1), np.float32)

        fresh = model.init(jax.random.PRNGKey(0), img, mask)
        variables = tc.init_with_pretrained_backbone(
            model, jax.random.PRNGKey(0), img, mask, sd
        )
        # Backbone stem kernel now equals the (transposed) timm weights.
        got = np.asarray(variables["params"]["backbone_net"]["stem_conv"]["kernel"])
        want = sd["conv_stem.weight"].transpose(2, 3, 1, 0)
        np.testing.assert_array_equal(got, want)
        # Head params are untouched (identical to fresh init).
        f0 = flax.traverse_util.flatten_dict(fresh["params"]["head"], sep="/")
        f1 = flax.traverse_util.flatten_dict(variables["params"]["head"], sep="/")
        for k in f0:
            np.testing.assert_array_equal(np.asarray(f0[k]), np.asarray(f1[k]))
        out = model.apply(variables, img, mask)
        assert out.shape == img.shape and bool(np.isfinite(np.asarray(out)).all())

    def test_graft_curve_model(self):
        """The curve model's backbone subtree is named 'backbone' (not the
        flagship's 'backbone_net'); the graft re-keys accordingly."""
        from curl_tpu.models import CurlCurveNet

        model = CurlCurveNet(backbone="tiny")
        sd = _synthetic_sd(tc.timm_key_shapes(bb.TINY), seed=4)
        img = np.random.default_rng(0).uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
        mask = np.ones((1, 32, 32, 1), np.float32)
        variables = tc.init_with_pretrained_backbone(
            model, jax.random.PRNGKey(0), img, mask, sd
        )
        got = np.asarray(variables["params"]["backbone"]["stem_conv"]["kernel"])
        np.testing.assert_array_equal(got, sd["conv_stem.weight"].transpose(2, 3, 1, 0))
        out, _ = model.apply(variables, img, mask)
        assert bool(np.isfinite(np.asarray(out)).all())

    def test_convert_cli_pretrained_mode(self, tmp_path):
        """--pretrained_backbone writes a restorable full train-state
        checkpoint from a raw timm .pt (tiny config via monkeypatched
        CONFIGS is avoided: run the library function directly on tiny)."""
        torch = pytest.importorskip("torch")

        shapes = tc.timm_key_shapes(bb.TINY)
        sd = {k: torch.from_numpy(np.asarray(v)) for k, v in _synthetic_sd(shapes).items()}
        pt = tmp_path / "timm_tiny.pt"
        torch.save(sd, pt)

        from curl_tpu.cli.convert import convert

        out = convert(
            str(pt), str(tmp_path / "ckpt"), backbone="tiny",
            pretrained_backbone=True,
        )
        from curl_tpu.train import checkpoint as ckpt_lib
        from curl_tpu.train import state as state_lib

        model = TriSpacePolyNet(backbone="tiny")
        tx = state_lib.make_optimizer(state_lib.onecycle_schedule(1, 1))
        template = state_lib.create_train_state(
            model, jax.random.PRNGKey(0),
            np.zeros((1, 64, 64, 3), np.float32),
            np.ones((1, 64, 64, 1), np.float32), tx,
        )
        restored, epoch = ckpt_lib.restore(out, template)
        assert epoch == 0
        got = np.asarray(restored.params["backbone_net"]["stem_conv"]["kernel"])
        want = np.asarray(sd["conv_stem.weight"]).transpose(2, 3, 1, 0)
        np.testing.assert_array_equal(got, want)
