"""Utility-layer tests: axis helpers, profiling timer, bf16 compute mode,
auto-resume."""

import glob
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curl_tpu import utils
from curl_tpu.models import TriSpacePolyNet


class TestImageIO:
    def test_axis_roundtrip_3d(self, rng):
        img = rng.uniform(size=(5, 7, 3)).astype(np.float32)
        np.testing.assert_array_equal(utils.chw_to_hwc(utils.hwc_to_chw(img)), img)

    def test_axis_roundtrip_4d(self, rng):
        img = rng.uniform(size=(2, 5, 7, 3)).astype(np.float32)
        chw = utils.hwc_to_chw(img)
        assert chw.shape == (2, 3, 5, 7)
        np.testing.assert_array_equal(utils.chw_to_hwc(chw), img)

    def test_save_load(self, rng, tmp_path):
        img = rng.uniform(size=(8, 8, 3)).astype(np.float32)
        path = str(tmp_path / "x.png")
        utils.save_image_u8(img, path)
        back = utils.load_image_u8(path)
        np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-6)


class TestProfiling:
    def test_step_timer(self):
        t = utils.StepTimer(window=4)
        assert t.images_per_sec == 0.0
        for _ in range(5):
            t.step(8)
        assert t.images_per_sec > 0

    def test_sync_forces_value(self, rng):
        x = jnp.asarray(rng.uniform(size=(4, 4)).astype(np.float32))
        assert np.isfinite(utils.sync(x * 2.0))

    def test_trace_noop_without_dir(self):
        with utils.trace(None):
            pass


class TestBF16Mode:
    def test_backbone_bf16_coeffs_fp32(self, rng):
        net = TriSpacePolyNet(backbone="tiny", compute_dtype="bfloat16")
        img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        mask = jnp.ones((1, 32, 32, 1), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), img, mask)
        r, l, h = net.apply(variables, img, mask, method=net.generate_coefficients)
        assert r.dtype == jnp.float32  # coefficients promoted back
        out = net.apply(variables, img, mask)
        assert out.dtype == jnp.float32
        assert np.isfinite(np.asarray(out)).all()

    def test_bf16_close_to_fp32(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        mask = jnp.ones((1, 32, 32, 1), jnp.float32)
        net32 = TriSpacePolyNet(backbone="tiny")
        variables = net32.init(jax.random.PRNGKey(0), img, mask)
        net16 = TriSpacePolyNet(backbone="tiny", compute_dtype="bfloat16")
        out32 = np.asarray(net32.apply(variables, img, mask))
        out16 = np.asarray(net16.apply(variables, img, mask))
        assert np.abs(out32 - out16).max() < 0.15  # bf16 backbone noise only


class TestAutoResume:
    def test_trainer_auto_resumes(self, tmp_path, rng):
        from PIL import Image

        from curl_tpu.cli import main as main_cli

        root = tmp_path / "ds"
        for d in ("in_input", "in_output", "in_mask"):
            (root / d).mkdir(parents=True)
        for n in ("1", "2"):
            a = (rng.uniform(0, 255, (40, 40, 3))).astype(np.uint8)
            Image.fromarray(a).save(root / "in_input" / f"{n}.png")
            Image.fromarray(a).save(root / "in_output" / f"{n}.png")
            Image.fromarray(np.full((40, 40), 255, np.uint8)).save(root / "in_mask" / f"{n}.png")
        (root / "images_train.txt").write_text("1\n2\n")
        (root / "images_valid.txt").write_text("1\n")
        args = [
            f"--training_img_dirpath={root}",
            "--backbone=tiny",
            "--batch_size=2",
            "--crop_h=32",
            "--crop_w=32",
            f"--log_dirpath={tmp_path}/log",
            "--valid_every=1",
            "--num_workers=1",
        ]
        main_cli.main(args + ["--num_epoch=1"])
        # Re-running with auto_resume continues from epoch 1 -> only epoch 2
        # gets trained and checkpointed.
        main_cli.main(args + ["--num_epoch=2", "--auto_resume=true"])
        ckpts = glob.glob(f"{tmp_path}/log/checkpoints/curl_*epoch_2")
        assert len(ckpts) == 1
