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
    def test_flag_parses_and_default_is_high(self):
        from curl_tpu.config import parse_config

        assert parse_config([]).matmul_precision == "high"
        assert parse_config(["--matmul_precision=highest"]).matmul_precision == "highest"

    def test_cli_applies_precision(self, dataset_root, tmp_path):
        """The training CLI must install the configured matmul precision —
        on TPU the default bf16 passes make optimization diverge (round-2
        hardware finding, docs/STATUS.md)."""
        import jax

        before = jax.config.jax_default_matmul_precision
        try:
            logdir = tmp_path / "log"
            main_cli.main(
                _common_args(dataset_root, logdir) + ["--num_epoch=1", "--valid_every=1"]
            )
            assert jax.config.jax_default_matmul_precision == "high"
        finally:
            # Don't leak the process-global precision into later-collected
            # tests (their numerics must stay order-independent).
            jax.config.update("jax_default_matmul_precision", before)


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


class TestEvalDevicePadding:
    def test_odd_split_uses_all_devices_with_exact_metrics(self, dataset_root, tmp_path):
        """A 9-image split on the 8-device mesh must pad the batch (data=8,
        wrapped rows masked by valid_count) instead of idling 7 devices —
        and produce the same metrics as a single-device run."""
        import warnings

        from PIL import Image

        # Train a tiny checkpoint once.
        logdir = tmp_path / "log"
        main_cli.main(
            _common_args(dataset_root, logdir) + ["--num_epoch=1", "--valid_every=1"]
        )
        ckpt = glob.glob(str(logdir / "checkpoints" / "curl_validpsnr_*"))[0]

        # A 9-image inference split.
        root = tmp_path / "nine"
        for d in ("images_input", "images_output", "images_mask"):
            (root / d).mkdir(parents=True)
        rng = np.random.default_rng(11)
        names = [str(i) for i in range(1, 10)]
        for name in names:
            arr = rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
            out = np.clip(arr.astype(np.int32) + 10, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(root / "images_input" / f"{name}.png")
            Image.fromarray(out).save(root / "images_output" / f"{name}.png")
            Image.fromarray(np.full((48, 64), 255, np.uint8)).save(
                root / "images_mask" / f"{name}.png"
            )
        (root / "images_inference.txt").write_text("\n".join(names) + "\n")

        def run(extra, logname):
            from curl_tpu.config import parse_config

            cfg = parse_config(
                [
                    f"--inference_img_dirpath={root}",
                    f"--checkpoint_filepath={ckpt}",
                    "--backbone=tiny",
                    "--batch_size=32",
                    "--crop_h=32",
                    "--crop_w=32",
                    f"--log_dirpath={tmp_path / logname}",
                ]
                + extra
            )
            return main_cli.run_batch_inference(cfg)

        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)  # auto_mesh must not warn
            multi = run([], "inf8")
        single = run(["--mesh_data=1"], "inf1")
        for k in ("loss", "psnr", "msssim"):
            np.testing.assert_allclose(multi[k], single[k], rtol=1e-4, atol=1e-5)
        # All 9 images dumped exactly once (no padded duplicates).
        dumped = glob.glob(str(tmp_path / "inf8" / "inference" / "1" / "*.png"))
        assert len(dumped) == 9


class TestInferDirSingleProgram:
    def test_trailing_chunk_padded_to_one_batch_shape(self, dataset_root, tmp_path, monkeypatch):
        """6 images at batch 4 must reach the device as two batches of FOUR
        (trailing chunk padded -> one compiled program per resolution
        group), with exactly 6 outputs written."""
        from curl_tpu.config import Config
        from curl_tpu.infer.engine import Enhancer

        logdir = tmp_path / "log"
        main_cli.main(
            _common_args(dataset_root, logdir) + ["--num_epoch=1", "--valid_every=1"]
        )
        ckpt = glob.glob(str(logdir / "checkpoints" / "curl_validpsnr_*"))[0]

        seen: list[int] = []
        orig = Enhancer.enhance_stream

        def spy(self, batches, max_in_flight=6):
            def recording():
                for small, smask, tgt in batches:
                    seen.append(tgt.shape[0])
                    yield small, smask, tgt

            return orig(self, recording(), max_in_flight=max_in_flight)

        monkeypatch.setattr(Enhancer, "enhance_stream", spy)
        written = infer_cli.infer_dir(
            str(dataset_root / "images_input"),
            ckpt,
            str(tmp_path / "enhanced"),
            backbone_size=32,
            batch_size=4,
            cfg=Config(backbone="tiny"),
        )
        assert seen == [4, 4]  # one batch shape -> one compiled program
        assert len(written) == 6
        assert len(set(written)) == 6

    def test_img_dir_routes_oversized_images_through_banded_path(
        self, dataset_root, tmp_path, monkeypatch, rng
    ):
        """Images above the per-image HBM heuristic (8K in production) must
        be served via the auto-banded single-image path, not the whole-image
        stream program (simulated with a tiny bound)."""
        from PIL import Image

        from curl_tpu.config import Config
        from curl_tpu.infer.engine import Enhancer

        logdir = tmp_path / "log"
        main_cli.main(
            _common_args(dataset_root, logdir) + ["--num_epoch=1", "--valid_every=1"]
        )
        ckpt = glob.glob(str(logdir / "checkpoints" / "curl_validpsnr_*"))[0]

        img_dir = tmp_path / "mixed"
        img_dir.mkdir()
        big = rng.uniform(0, 255, (96, 64, 3)).astype(np.uint8)
        small = rng.uniform(0, 255, (32, 64, 3)).astype(np.uint8)
        Image.fromarray(big).save(img_dir / "big.png")
        Image.fromarray(small).save(img_dir / "small.png")

        streamed: list[tuple] = []
        orig = Enhancer.enhance_stream

        def spy(self, batches, max_in_flight=6):
            def recording():
                for s, m, t in batches:
                    streamed.append(tuple(t.shape[1:3]))
                    yield s, m, t

            return orig(self, recording(), max_in_flight=max_in_flight)

        monkeypatch.setattr(Enhancer, "enhance_stream", spy)
        written = infer_cli.infer_dir(
            str(img_dir),
            ckpt,
            str(tmp_path / "enhanced_mixed"),
            backbone_size=32,
            batch_size=4,
            # The user-facing HBM-heuristic knob, simulated small.
            cfg=Config(backbone="tiny", auto_tile_pixels=32 * 64),
        )
        assert sorted(os.path.basename(w) for w in written) == ["big.png", "small.png"]
        # Only the small group went through the stream; the big image was
        # served banded.
        assert streamed == [(32, 64)]
        out = np.asarray(Image.open(tmp_path / "enhanced_mixed" / "big.png"))
        assert out.shape == (96, 64, 3)

    def test_img_dir_rejects_tile_and_mask_flags(self, tmp_path):
        with pytest.raises(SystemExit):
            infer_cli.main(
                [
                    "--img_dir=/nonexistent",
                    "--out_dir=/tmp/x",
                    "--checkpoint_dir=/tmp/c",
                    "--tile_rows=64",
                ]
            )
        with pytest.raises(SystemExit):
            infer_cli.main(
                [
                    "--img_dir=/nonexistent",
                    "--out_dir=/tmp/x",
                    "--checkpoint_dir=/tmp/c",
                    "--mask_path=/tmp/m.png",
                ]
            )


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
