"""End-to-end torch-checkpoint migration test: build a real torch .pt file
(the reference's on-disk format), convert it with the CLI, and verify the
restored model reproduces the source model's forward output."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from curl_tpu.cli import convert as convert_cli
from curl_tpu.export import torch_convert
from curl_tpu.models import TriSpacePolyNet
from curl_tpu.models import backbone as bb


class TestConvertCLI:
    def test_pt_roundtrip_through_cli(self, rng, tmp_path):
        # Source-of-truth flax model -> torch-style state dict -> .pt file
        # (wrapped like the reference's training checkpoints, main.py:332-338,
        # including the DDP 'module.' prefix).
        net = TriSpacePolyNet(backbone="tiny")
        img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        mask = jnp.ones((1, 32, 32, 1), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), img, mask)
        sd = torch_convert.export_trispace_state_dict(variables, bb.TINY)
        torch_sd = {"module." + k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
        pt_path = tmp_path / "curl_model.pt"
        torch.save({"model_state_dict": torch_sd, "epoch": 7}, pt_path)

        out_dir = tmp_path / "converted"
        convert_cli.main(
            [
                f"--torch_checkpoint={pt_path}",
                f"--out_dir={out_dir}",
                "--backbone=tiny",
            ]
        )

        # Restore through the SAME path every CLI uses (ckpt_lib.restore with
        # a full train-state template) and compare forwards.
        from curl_tpu.train import checkpoint as ckpt_lib
        from curl_tpu.train import state as state_lib

        tx = state_lib.make_optimizer(state_lib.onecycle_schedule(1, 1))
        template = state_lib.create_train_state(
            net, jax.random.PRNGKey(1),
            np.zeros((1, 32, 32, 3), np.float32),
            np.ones((1, 32, 32, 1), np.float32), tx,
        )
        restored, epoch = ckpt_lib.restore(str(out_dir), template)
        assert epoch == 7
        out_src = net.apply(variables, img, mask)
        out_conv = net.apply(
            {"params": restored.params, "batch_stats": restored.batch_stats},
            img,
            mask,
        )
        np.testing.assert_allclose(np.asarray(out_conv), np.asarray(out_src), atol=1e-6)

    def test_converted_checkpoint_matches_reference_composition(self, rng, tmp_path):
        """Fidelity of a migrated checkpoint measured against the REFERENCE's
        own pixel pipeline: torch .pt -> convert CLI -> restored model; its
        predicted coefficients fed through the reference's
        `generate_residual`/`generate_image` (/root/reference/model.py:499-520)
        must reproduce the restored model's enhanced image."""
        from reference_oracle import load, reference_available

        if not reference_available():
            pytest.skip("reference checkout not available")

        net = TriSpacePolyNet(backbone="tiny")
        img_np = rng.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32)
        img = jnp.asarray(img_np)
        mask = jnp.ones((1, 32, 48, 1), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), img, mask)
        sd = torch_convert.export_trispace_state_dict(variables, bb.TINY)
        pt_path = tmp_path / "curl_model.pt"
        torch.save(
            {"model_state_dict": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}},
            pt_path,
        )
        out_dir = tmp_path / "converted"
        convert_cli.main([f"--torch_checkpoint={pt_path}", f"--out_dir={out_dir}", "--backbone=tiny"])

        from curl_tpu.train import checkpoint as ckpt_lib
        from curl_tpu.train import state as state_lib

        tx = state_lib.make_optimizer(state_lib.onecycle_schedule(1, 1))
        template = state_lib.create_train_state(
            net, jax.random.PRNGKey(1),
            np.zeros((1, 32, 48, 3), np.float32),
            np.ones((1, 32, 48, 1), np.float32), tx,
        )
        restored, _ = ckpt_lib.restore(str(out_dir), template)
        restored_vars = {"params": restored.params, "batch_stats": restored.batch_stats}
        ours = np.asarray(net.apply(restored_vars, img, mask))
        R, L, H = net.apply(
            restored_vars, img, mask, method=TriSpacePolyNet.generate_coefficients
        )

        ref_model = load("model")
        ref_net = ref_model.TriSpaceRegNet(polynomial_order=4, spatial=True, is_train=True)
        t = lambda a: torch.from_numpy(np.ascontiguousarray(np.asarray(a)))
        img_t = t(img_np.transpose(0, 3, 1, 2))
        with torch.no_grad():
            res_t = ref_net.generate_residual(img_t, t(R), t(L), t(H))
            ref_img = ref_net.generate_image(img_t, res_t)
        ref = ref_img.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, atol=5e-5)

    def test_shape_mismatch_fails_loudly(self, rng, tmp_path):
        net = TriSpacePolyNet(backbone="tiny")
        img = jnp.zeros((1, 32, 32, 3))
        mask = jnp.ones((1, 32, 32, 1))
        variables = net.init(jax.random.PRNGKey(0), img, mask)
        sd = torch_convert.export_trispace_state_dict(variables, bb.TINY)
        # Corrupt one layer's width.
        k = "backbone.conv_stem.weight"
        sd[k] = np.zeros((16,) + sd[k].shape[1:], np.float32)
        pt_path = tmp_path / "bad.pt"
        torch.save({"model_state_dict": {kk: torch.from_numpy(np.ascontiguousarray(v)) for kk, v in sd.items()}}, pt_path)
        with pytest.raises(ValueError, match="shape mismatch|does not fit"):
            convert_cli.convert(str(pt_path), str(tmp_path / "out"), backbone="tiny")
