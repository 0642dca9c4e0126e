"""Learning-dynamics test on the bundled real photo pairs.

Builds a 9-image dataset from the reference's bundled Adobe5K examples and
trains the tiny-backbone model for a handful of epochs: training loss must
drop substantially and the model must beat the identity baseline on the
train split — i.e. the whole pipeline (decode -> augment -> model -> 5-term
loss -> optimizer) actually learns on real photographs, not just on random
noise. Marked slow; skipped when the artifacts are missing.
"""

import os
import shutil

import numpy as np
import pytest

_DPE = "/root/reference/adobe5k_dpe"

requires_artifacts = pytest.mark.skipif(
    not os.path.isdir(os.path.join(_DPE, "curl_example_test_input")),
    reason="bundled adobe5k_dpe example artifacts not available",
)


@pytest.fixture(scope="module")
def adobe9(tmp_path_factory):
    dst = tmp_path_factory.mktemp("adobe9")
    (dst / "demo_input").mkdir()
    (dst / "demo_output").mkdir()
    inp = sorted(os.listdir(os.path.join(_DPE, "curl_example_test_input")))
    out = sorted(os.listdir(os.path.join(_DPE, "curl_example_test_output")))
    names = []
    for i, (a, b) in enumerate(zip(inp, out), 1):
        shutil.copy(os.path.join(_DPE, "curl_example_test_input", a), dst / "demo_input" / f"{i}.png")
        shutil.copy(os.path.join(_DPE, "curl_example_test_output", b), dst / "demo_output" / f"{i}.png")
        names.append(str(i))
    (dst / "images_train.txt").write_text("\n".join(names[:8]) + "\n")
    (dst / "images_valid.txt").write_text(names[8] + "\n")
    return dst


@requires_artifacts
@pytest.mark.slow
class TestLearnsOnRealPhotos:
    def test_loss_drops_and_beats_identity(self, adobe9):
        import jax
        import jax.numpy as jnp

        from curl_tpu import data as cdata
        from curl_tpu import models
        from curl_tpu.train import state as state_lib, steps as steps_lib

        records = cdata.select_records(
            cdata.scan_data_dir(adobe9), cdata.read_split_ids(adobe9 / "images_train.txt")
        )
        loader = cdata.Loader(records, batch_size=8, crop=(128, 128), train=True, seed=0)
        model = models.TriSpacePolyNet(backbone="tiny", identity_init=True)
        tx = state_lib.make_optimizer(
            state_lib.onecycle_schedule(40, len(loader), peak_lr=1e-4)
        )
        sample = np.zeros((1, 128, 128, 3), np.float32)
        state = state_lib.create_train_state(
            model, jax.random.PRNGKey(0), sample, np.ones((1, 128, 128, 1), np.float32), tx
        )
        train_step = steps_lib.make_train_step(augment=False)

        rng = jax.random.PRNGKey(1)
        losses = []
        for epoch in range(40):
            loader.set_epoch(epoch)
            for batch in loader:
                batch.pop("name"); batch.pop("valid_count")
                rng, key = jax.random.split(rng)
                state, stats = train_step(state, {k: jnp.asarray(v) for k, v in batch.items()}, key)
                losses.append(float(stats["loss"]))
        assert losses[-1] < losses[0] * 0.6, (losses[0], losses[-1])

        # Identity baseline: enhanced-by-nothing loss on a fixed batch.
        loader.set_epoch(0)
        batch = next(iter(cdata.Loader(records, batch_size=8, crop=(128, 128), train=False)))
        # Normalize the uint8 wire format as the jitted step would.
        inp = jnp.asarray(batch["input_img"], jnp.float32) / 255.0
        tgt = jnp.asarray(batch["output_img"], jnp.float32) / 255.0
        mask = jnp.asarray(batch["mask"], jnp.float32)
        identity_loss = float(models.curl_loss(inp, tgt, mask))
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats}, inp, mask
        )
        model_loss = float(models.curl_loss(out, tgt, mask))
        # The trained model must clearly beat leaving the photo untouched.
        assert model_loss < identity_loss * 0.8, (model_loss, identity_loss)
