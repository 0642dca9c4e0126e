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

        # Restore through orbax and compare forwards.
        import orbax.checkpoint as ocp

        template = {
            "params": jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, variables["params"]
            ),
            "batch_stats": jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, variables["batch_stats"]
            ),
            "epoch": 0,
        }
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(str(out_dir), template)
        assert restored["epoch"] == 7
        out_src = net.apply(variables, img, mask)
        out_conv = net.apply(
            {"params": restored["params"], "batch_stats": restored["batch_stats"]},
            img,
            mask,
        )
        np.testing.assert_allclose(np.asarray(out_conv), np.asarray(out_src), atol=1e-6)
