"""Training-layer tests: state/optimizer, jitted steps, schedule parity,
checkpoint round-trip, and the data-parallel path on an 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curl_tpu import models
from curl_tpu.parallel import mesh as mesh_lib
from curl_tpu.train import checkpoint as ckpt_lib
from curl_tpu.train import state as state_lib
from curl_tpu.train import steps as steps_lib


def _make_state(tx=None):
    model = models.TriSpacePolyNet(backbone="tiny")
    if tx is None:
        tx = state_lib.make_optimizer(state_lib.onecycle_schedule(10, 2))
    img = np.zeros((1, 32, 32, 3), np.float32)
    mask = np.ones((1, 32, 32, 1), np.float32)
    return state_lib.create_train_state(model, jax.random.PRNGKey(0), img, mask, tx)


def _batch(rng, b=2, s=32):
    return {
        "input_img": jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32)),
        "output_img": jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32)),
        "mask": jnp.ones((b, s, s, 1), jnp.float32),
        "valid_count": jnp.asarray(b, jnp.int32),
    }


class TestSchedule:
    def test_matches_torch_onecycle_per_epoch(self):
        torch = pytest.importorskip("torch")

        num_epochs = 50
        sched = state_lib.onecycle_schedule(num_epochs, steps_per_epoch=7, peak_lr=1e-4)
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.Adam([p], lr=5e-7)
        t_sched = torch.optim.lr_scheduler.OneCycleLR(opt, max_lr=1e-4, total_steps=num_epochs)
        for epoch in range(num_epochs):
            t_lr = opt.param_groups[0]["lr"]
            # Our schedule is indexed by global step; epoch granularity means
            # any step within the epoch sees the same lr.
            j_lr = float(sched(epoch * 7 + 3))
            np.testing.assert_allclose(j_lr, t_lr, rtol=1e-5)
            opt.step()
            t_sched.step()


class TestTrainStep:
    def test_loss_decreases(self, rng):
        state = _make_state()
        step = steps_lib.make_train_step(augment=False)
        batch = _batch(rng)
        losses = []
        for i in range(8):
            state, stats = step(state, dict(batch), jax.random.PRNGKey(i))
            losses.append(float(stats["loss"]))
        assert losses[-1] < losses[0]

    def test_augmented_step_runs(self, rng):
        state = _make_state()
        step = steps_lib.make_train_step(augment=True)
        state, stats = step(state, _batch(rng), jax.random.PRNGKey(0))
        assert np.isfinite(float(stats["loss"]))

    def test_eval_step_stats(self, rng):
        state = _make_state()
        estep = steps_lib.make_eval_step()
        batch = _batch(rng, b=4)
        batch["valid_count"] = jnp.asarray(3, jnp.int32)  # one padded example
        stats = estep(state, batch)
        assert float(stats["count"]) == 3.0
        assert stats["enhanced"].shape == (4, 32, 32, 3)
        scalar_keys = ("loss_sum", "psnr_sum", "psnr_count", "msssim_sum", "count")
        summary = steps_lib.summarize_eval({k: float(stats[k]) for k in scalar_keys})
        assert np.isfinite(summary["loss"]) and np.isfinite(summary["psnr"])

    def test_summarize_eval_device_accumulation(self, rng):
        """Device-scalar totals (the Evaluator's one-sync accumulation,
        round 4) must summarize identically to host-float totals."""
        state = _make_state()
        estep = steps_lib.make_eval_step()
        totals_dev: dict = {}
        totals_host: dict = {}
        scalar_keys = ("loss_sum", "psnr_sum", "psnr_count", "msssim_sum", "count")
        for i in range(3):
            batch = _batch(rng, b=2)
            batch["valid_count"] = jnp.asarray(2, jnp.int32)
            stats = estep(state, batch)
            for k in scalar_keys:
                totals_dev[k] = stats[k] if k not in totals_dev else totals_dev[k] + stats[k]
                totals_host[k] = totals_host.get(k, 0.0) + float(stats[k])
        s_dev = steps_lib.summarize_eval(totals_dev)
        s_host = steps_lib.summarize_eval(totals_host)
        for k in ("loss", "psnr", "msssim"):
            assert isinstance(s_dev[k], float)
            np.testing.assert_allclose(s_dev[k], s_host[k], rtol=1e-6)

    def test_stack_eval_totals_one_fetch_float64(self, rng):
        """The Evaluator's per-batch stacking path (one fetch per pass) must
        sum in float64 on the host: a +1 onto 3e8 is lost by chained fp32
        adds but must survive here (the large-split drift fix)."""
        per_batch = [{"a": jnp.asarray(1e8, jnp.float32), "b": jnp.asarray(float(i), jnp.float32)}
                     for i in range(3)]
        per_batch.append({"a": jnp.asarray(1.0, jnp.float32), "b": jnp.asarray(0.0, jnp.float32)})
        totals = steps_lib.stack_eval_totals(per_batch)
        assert totals["a"] == 3e8 + 1.0  # fp32 chained adds would drop the +1
        assert totals["b"] == 3.0
        assert all(isinstance(v, float) for v in totals.values())
        assert steps_lib.stack_eval_totals([]) == {}


class TestDataParallel:
    def test_train_step_on_8_device_mesh(self, rng):
        mesh = mesh_lib.local_mesh_cpu(8)
        state = _make_state()
        state = mesh_lib.shard_pytree(state, mesh_lib.replicated(mesh))
        bsh = mesh_lib.batch_sharding(mesh)
        step = steps_lib.make_train_step(augment=False)
        batch = {
            k: jax.device_put(v, bsh) if hasattr(v, "ndim") and v.ndim > 0 else v
            for k, v in _batch(rng, b=8).items()
        }
        state, stats = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(stats["loss"]))
        # Params stay replicated after the update.
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_dp_matches_single_device(self, rng):
        # The sharded step must compute the same update as the unsharded one.
        mesh = mesh_lib.local_mesh_cpu(8)
        batch = _batch(rng, b=8)
        step = steps_lib.make_train_step(augment=False)

        state1 = _make_state()
        state1, stats1 = step(state1, dict(batch), jax.random.PRNGKey(0))

        state2 = _make_state()
        state2 = mesh_lib.shard_pytree(state2, mesh_lib.replicated(mesh))
        sharded = {
            k: jax.device_put(v, mesh_lib.batch_sharding(mesh))
            if hasattr(v, "ndim") and v.ndim > 0
            else v
            for k, v in batch.items()
        }
        state2, stats2 = step(state2, sharded, jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(stats1["loss"]), float(stats2["loss"]), rtol=1e-5)
        l1 = jax.tree_util.tree_leaves(state1.params)[0]
        l2 = jax.tree_util.tree_leaves(state2.params)[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


class TestCheckpoint:
    def test_roundtrip(self, rng, tmp_path):
        state = _make_state()
        step = steps_lib.make_train_step(augment=False)
        state, _ = step(state, _batch(rng), jax.random.PRNGKey(0))
        path = ckpt_lib.save(str(tmp_path), state, epoch=3, valid_psnr=21.5, valid_loss=0.08)
        assert "validpsnr_21.500" in path

        template = _make_state()
        restored, start_epoch = ckpt_lib.restore(path, template)
        assert start_epoch == 3
        assert int(restored.step) == int(state.step)
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_latest_and_prune(self, rng, tmp_path):
        state = _make_state()
        for e in range(4):
            ckpt_lib.save(str(tmp_path), state, epoch=e + 1, valid_psnr=20.0 + e,
                          valid_loss=0.1, keep=2)
        entries = ckpt_lib.list_checkpoints(str(tmp_path))
        assert len(entries) == 2
        assert ckpt_lib.latest_checkpoint(str(tmp_path)).endswith("epoch_4")

    def test_prune_keeps_best_psnr(self, rng, tmp_path):
        """The best-valid-PSNR checkpoint must survive pruning even when it
        is not among the newest `keep` (reference intent main.py:252,325)."""
        state = _make_state()
        # Best PSNR lands at epoch 1, then quality regresses.
        for e, psnr in enumerate([30.0, 21.0, 22.0, 23.0]):
            ckpt_lib.save(str(tmp_path), state, epoch=e + 1, valid_psnr=psnr,
                          valid_loss=0.1, keep=2)
        best = ckpt_lib.best_checkpoint(str(tmp_path))
        assert best is not None and "validpsnr_30.000" in best
        entries = ckpt_lib.list_checkpoints(str(tmp_path))
        # newest 2 + the protected best = 3
        assert len(entries) == 3
        assert any(p == best for p, _ in entries)

    def test_restore_reinitializes_mismatched_opt_state(self, rng, tmp_path):
        """A checkpoint saved with a plain-Adam opt_state must restore into a
        trainer configured with grad clipping (extra optax chain stage) by
        falling back to a fresh optimizer state instead of erroring."""
        state = _make_state()  # default optimizer, no clip stage
        step = steps_lib.make_train_step(augment=False)
        state, _ = step(state, _batch(rng), jax.random.PRNGKey(0))
        path = ckpt_lib.save(str(tmp_path), state, epoch=2, valid_psnr=20.0,
                             valid_loss=0.1)

        tx_clip = state_lib.make_optimizer(
            state_lib.onecycle_schedule(10, 2), clip_grad_norm=1.0
        )
        template = _make_state(tx=tx_clip)
        restored, start_epoch = ckpt_lib.restore(path, template)
        assert start_epoch == 2
        assert int(restored.step) == int(state.step)
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # Fresh opt_state matches the clipping template's structure, so a
        # step under the new optimizer runs.
        restored, stats = steps_lib.make_train_step(augment=False)(
            restored, _batch(rng), jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(stats["loss"]))


class TestAutoMesh:
    def test_warns_when_devices_idle(self):
        """Global batch 7 on 8 devices would train on ONE chip — must warn."""
        devices = jax.devices("cpu")[:8]
        with pytest.warns(UserWarning, match="IDLE"):
            mesh = mesh_lib.auto_mesh(7, devices=devices)
        assert mesh.devices.size == 1

    def test_no_warning_when_divisible(self, recwarn):
        devices = jax.devices("cpu")[:8]
        mesh = mesh_lib.auto_mesh(16, devices=devices)
        assert mesh.devices.size == 8
        assert not [w for w in recwarn if "IDLE" in str(w.message)]

    def test_pad_batch_size(self):
        assert mesh_lib.pad_batch_size(7, 8) == 8
        assert mesh_lib.pad_batch_size(8, 8) == 8
        assert mesh_lib.pad_batch_size(9, 8) == 16
        assert mesh_lib.pad_batch_size(1, 8) == 8


class TestTrainerGuards:
    def test_empty_train_loader_raises(self, tmp_path, rng):
        from PIL import Image

        from curl_tpu.config import Config
        from curl_tpu.data import scan_data_dir, select_records
        from curl_tpu.train.loop import Trainer

        root = tmp_path / "ds"
        for d in ("d_input", "d_output"):
            (root / d).mkdir(parents=True)
        for n in ("1", "2"):
            arr = rng.uniform(0, 255, (16, 16, 3)).astype(np.uint8)
            Image.fromarray(arr).save(root / "d_input" / f"{n}.png")
            Image.fromarray(arr).save(root / "d_output" / f"{n}.png")
        records = select_records(scan_data_dir(root), ["1", "2"])
        cfg = Config(backbone="tiny", batch_size=8, crop_h=16, crop_w=16,
                     log_dirpath=str(tmp_path / "log"))
        with pytest.raises(ValueError, match="exceeds the 2 training examples"):
            Trainer(cfg, records, records)


class TestModelAxisMesh:
    def test_train_step_on_4x2_mesh(self, rng):
        """The reserved tensor-parallel axis must not break the data-parallel
        step: (data=4, model=2) mesh, batch sharded over data only."""
        devices = jax.devices("cpu")[:8]
        mesh = mesh_lib.make_mesh(devices, data=4, model=2)
        state = _make_state()
        state = mesh_lib.shard_pytree(state, mesh_lib.replicated(mesh))
        bsh = mesh_lib.batch_sharding(mesh)
        step = steps_lib.make_train_step(augment=False)
        base_batch = _batch(rng, b=8)
        batch = {
            k: jax.device_put(v, bsh) if hasattr(v, "ndim") and v.ndim > 0 else v
            for k, v in base_batch.items()
        }
        state, stats = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(stats["loss"]))

        ref_state = _make_state()
        ref_state, ref_stats = step(ref_state, dict(base_batch), jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            float(stats["loss"]), float(ref_stats["loss"]), rtol=1e-5
        )


class TestCurveModelTraining:
    def test_train_and_eval_steps_with_curve_model(self, rng):
        """Regression: tuple-returning models (image, regulariser) must train
        and evaluate; the regulariser joins the loss."""
        model = models.CurlCurveNet(backbone="tiny")
        tx = state_lib.make_optimizer(state_lib.onecycle_schedule(10, 2))
        img = np.zeros((1, 32, 32, 3), np.float32)
        mask = np.ones((1, 32, 32, 1), np.float32)
        state = state_lib.create_train_state(model, jax.random.PRNGKey(0), img, mask, tx)
        step = steps_lib.make_train_step(augment=False, reg_weight=1e-4)
        batch = _batch(rng)
        losses = []
        for i in range(4):
            state, stats = step(state, dict(batch), jax.random.PRNGKey(i))
            losses.append(float(stats["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

        estep = steps_lib.make_eval_step()
        stats = estep(state, _batch(rng, b=2))
        assert np.isfinite(float(stats["loss_sum"]))
