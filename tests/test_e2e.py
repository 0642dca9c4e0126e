"""End-to-end workflow tests through the CLI entrypoints: train ->
checkpoint -> resume -> batch inference -> single-image inference, all on
the virtual CPU mesh with the tiny backbone."""

import glob
import os

import numpy as np
import pytest

from curl_tpu.cli import infer as infer_cli
from curl_tpu.cli import main as main_cli


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("e2e_data")
    for d in ("images_input", "images_output", "images_mask"):
        (root / d).mkdir()
    rng = np.random.default_rng(3)
    names = [str(i) for i in range(1, 7)]
    for name in names:
        arr = rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
        out = np.clip(arr.astype(np.int32) + 15, 0, 255).astype(np.uint8)
        mask = np.full((48, 64), 255, np.uint8)
        Image.fromarray(arr).save(root / "images_input" / f"{name}.png")
        Image.fromarray(out).save(root / "images_output" / f"{name}.png")
        Image.fromarray(mask).save(root / "images_mask" / f"{name}.png")
    (root / "images_train.txt").write_text("\n".join(names[:4]) + "\n")
    (root / "images_valid.txt").write_text("\n".join(names[4:]) + "\n")
    (root / "images_inference.txt").write_text("\n".join(names[4:]) + "\n")
    return root


class TestMatmulPrecisionConfig:
    def test_flag_parses_and_default_is_highest(self):
        from curl_tpu.config import parse_config

        assert parse_config([]).matmul_precision == "high"
        assert parse_config(["--matmul_precision=highest"]).matmul_precision == "highest"

    def test_cli_applies_precision(self, dataset_root, tmp_path):
        """The training CLI must install the configured matmul precision —
        on TPU the default bf16 passes make optimization diverge (round-2
        hardware finding, docs/STATUS.md)."""
        import jax

        logdir = tmp_path / "log"
        main_cli.main(
            _common_args(dataset_root, logdir) + ["--num_epoch=1", "--valid_every=1"]
        )
        assert jax.config.jax_default_matmul_precision == "high"


def _common_args(root, logdir):
    return [
        f"--training_img_dirpath={root}",
        "--backbone=tiny",
        "--batch_size=2",
        "--crop_h=32",
        "--crop_w=32",
        "--num_workers=2",
        f"--log_dirpath={logdir}",
    ]


class TestTrainCLI:
    def test_train_checkpoints_and_resume(self, dataset_root, tmp_path):
        logdir = tmp_path / "log"
        main_cli.main(
            _common_args(dataset_root, logdir) + ["--num_epoch=2", "--valid_every=1"]
        )
        ckpts = glob.glob(str(logdir / "checkpoints" / "curl_validpsnr_*"))
        assert len(ckpts) == 2
        assert os.path.isfile(logdir / "curl.log")

        # Resume from the last checkpoint for 1 more epoch.
        latest = sorted(ckpts, key=lambda p: int(p.rsplit("_epoch_", 1)[1]))[-1]
        logdir2 = tmp_path / "log2"
        main_cli.main(
            _common_args(dataset_root, logdir2)
            + ["--num_epoch=3", "--valid_every=1", f"--checkpoint_filepath={latest}"]
        )
        ckpts2 = glob.glob(str(logdir2 / "checkpoints" / "curl_validpsnr_*epoch_3"))
        assert len(ckpts2) == 1

    def test_batch_inference_mode(self, dataset_root, tmp_path):
        logdir = tmp_path / "log"
        main_cli.main(
            _common_args(dataset_root, logdir) + ["--num_epoch=1", "--valid_every=1"]
        )
        ckpt = glob.glob(str(logdir / "checkpoints" / "curl_validpsnr_*"))[0]
        infdir = tmp_path / "inflog"
        main_cli.main(
            [
                f"--inference_img_dirpath={dataset_root}",
                f"--checkpoint_filepath={ckpt}",
                "--backbone=tiny",
                "--batch_size=2",
                "--crop_h=32",
                "--crop_w=32",
                f"--log_dirpath={infdir}",
            ]
        )
        # Outputs are dumped under the evaluated split's name (default
        # --eval_split=inference).
        dumped = glob.glob(str(infdir / "inference" / "1" / "*.png"))
        assert len(dumped) == 2  # the two inference-split images

    def test_single_image_infer_cli(self, dataset_root, tmp_path):
        from curl_tpu.config import Config

        logdir = tmp_path / "log"
        main_cli.main(
            _common_args(dataset_root, logdir) + ["--num_epoch=1", "--valid_every=1"]
        )
        ckpt = glob.glob(str(logdir / "checkpoints" / "curl_validpsnr_*"))[0]
        out_path = str(tmp_path / "enhanced.png")
        arr = infer_cli.infer(
            str(dataset_root / "images_input" / "5.png"),
            str(dataset_root / "images_mask" / "5.png"),
            ckpt,
            out_path,
            backbone_size=32,
            cfg=Config(backbone="tiny"),
        )
        assert arr.shape == (48, 64, 3)
        assert os.path.isfile(out_path)

    def test_directory_infer_cli_streams_all_images(self, dataset_root, tmp_path):
        from curl_tpu.config import Config

        logdir = tmp_path / "log"
        main_cli.main(
            _common_args(dataset_root, logdir) + ["--num_epoch=1", "--valid_every=1"]
        )
        ckpt = glob.glob(str(logdir / "checkpoints" / "curl_validpsnr_*"))[0]
        out_dir = str(tmp_path / "enhanced")
        written = infer_cli.infer_dir(
            str(dataset_root / "images_input"),
            ckpt,
            out_dir,
            backbone_size=32,
            batch_size=4,  # 6 images -> a full batch + a partial batch
            cfg=Config(backbone="tiny"),
        )
        assert len(written) == 6
        assert sorted(os.path.basename(p) for p in written) == sorted(
            os.listdir(str(dataset_root / "images_input"))
        )
        assert all(os.path.isfile(p) for p in written)


class TestTiledApply:
    def test_tiled_matches_whole_image(self, dataset_root, tmp_path, rng):
        """Row-band tiled apply with global coordinates must equal the
        untiled apply."""
        import glob as _glob
        import jax
        from curl_tpu.config import Config
        from curl_tpu.models import TriSpacePolyNet
        from curl_tpu.infer.engine import Enhancer

        net = TriSpacePolyNet(backbone="tiny")
        img = np.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), np.float32)
        mask = np.ones((1, 32, 32, 1), np.float32)
        variables = net.init(jax.random.PRNGKey(0), img, mask)
        enh = Enhancer(net, variables, backbone_size=32)
        target = np.asarray(rng.uniform(0, 1, (1, 100, 64, 3)), np.float32)
        coeffs = enh.coefficients(img, mask)
        whole = np.asarray(enh.residual(target, coeffs))
        tiled = np.asarray(enh.residual(target, coeffs, tile_rows=48))
        np.testing.assert_allclose(tiled, whole, atol=1e-5)
