"""Data pipeline tests on a synthesized mini-dataset."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curl_tpu import data as cdata


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    """A 6-image paired dataset with masks and split files, written as PNGs
    with both integer and Adobe-style ids."""
    from PIL import Image

    root = tmp_path_factory.mktemp("adobe_mini")
    for d in ("train_input", "train_output", "train_mask"):
        (root / d).mkdir()
    rng = np.random.default_rng(0)
    names = ["1", "2", "3", "a0004", "a0005", "a0006"]
    for i, name in enumerate(names):
        h, w = 40 + 8 * i, 56 + 4 * i  # deliberately varied sizes
        arr = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
        out = np.clip(arr.astype(np.int32) + 20, 0, 255).astype(np.uint8)
        mask = (rng.uniform(size=(h, w)) < 0.9).astype(np.uint8) * 255
        Image.fromarray(arr).save(root / "train_input" / f"{name}.png")
        Image.fromarray(out).save(root / "train_output" / f"{name}.png")
        Image.fromarray(mask).save(root / "train_mask" / f"{name}.png")
    (root / "images_train.txt").write_text("\n".join(names[:4]) + "\n")
    (root / "images_valid.txt").write_text("\n".join(names[4:]) + "\n")
    return root


class TestDataset:
    def test_scan_and_split(self, mini_dataset):
        records = cdata.scan_data_dir(mini_dataset)
        assert len(records) == 6
        ids = cdata.read_split_ids(mini_dataset / "images_train.txt")
        recs = cdata.select_records(records, ids)
        assert [r.key for r in recs] == ["1", "2", "3", "a0004"]

    def test_unknown_id_raises(self, mini_dataset):
        records = cdata.scan_data_dir(mini_dataset)
        with pytest.raises(KeyError, match="zzz"):
            cdata.select_records(records, ["zzz"])

    def test_load_example(self, mini_dataset):
        records = cdata.scan_data_dir(mini_dataset)
        ex = cdata.load_example(records["1"])
        assert ex["input_img"].shape == (40, 56, 3)
        # uint8 wire format: raw bytes through cache/stack/H2D, normalized
        # to [0,1] fp32 on device by the jitted step.
        assert ex["input_img"].dtype == np.uint8
        assert ex["mask"].shape == (40, 56, 1)
        assert set(np.unique(ex["mask"])) <= {0, 1}

    def test_mask_optional(self, tmp_path):
        from PIL import Image

        (tmp_path / "x_input").mkdir()
        (tmp_path / "x_output").mkdir()
        img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
        img.save(tmp_path / "x_input" / "1.png")
        img.save(tmp_path / "x_output" / "1.png")
        records = cdata.scan_data_dir(tmp_path)
        ex = cdata.load_example(records["1"])
        assert (ex["mask"] == 1.0).all()

    def test_crop_random_and_center(self, mini_dataset):
        records = cdata.scan_data_dir(mini_dataset)
        ex = cdata.load_example(records["1"])  # 40x56, smaller than 64 crop
        rng = np.random.default_rng(0)
        cropped = cdata.crop_pair(ex, 64, 64, rng)  # pad-if-needed path
        assert cropped["input_img"].shape == (64, 64, 3)
        center = cdata.crop_pair(ex, 32, 32)
        assert center["input_img"].shape == (32, 32, 3)
        # Center crop of a deterministic region: same every time.
        again = cdata.crop_pair(ex, 32, 32)
        np.testing.assert_array_equal(center["input_img"], again["input_img"])


class TestAugment:
    def test_pair_transforms_identically(self, rng):
        b, s = 2, 32
        inp = rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32)
        mask = np.ones((b, s, s, 1), np.float32)
        a_in, a_out, a_mask = cdata.augment_batch(
            jnp.asarray(inp), jnp.asarray(inp), jnp.asarray(mask), jax.random.PRNGKey(0)
        )
        # input == output in, so they must stay equal out.
        np.testing.assert_array_equal(np.asarray(a_in), np.asarray(a_out))
        # Mask stays binary.
        assert set(np.unique(np.asarray(a_mask))) <= {0.0, 1.0}

    def test_rotation_zero_is_identity(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, (16, 16, 7)).astype(np.float32))
        out = cdata.rotate_nearest(img, jnp.asarray(0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_rotation_180_flips_both_axes(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, (17, 17, 1)).astype(np.float32))
        out = cdata.rotate_nearest(img, jnp.asarray(np.pi))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(img)[::-1, ::-1], atol=1e-5
        )

    def test_rotation_fills_corners_with_zero(self, rng):
        img = jnp.ones((32, 32, 1), jnp.float32)
        out = np.asarray(cdata.rotate_nearest(img, jnp.asarray(np.pi / 4)))
        assert out[0, 0, 0] == 0.0 and out[-1, -1, 0] == 0.0
        assert out[16, 16, 0] == 1.0

    def test_u8_augment_matches_f32(self, rng):
        """Augmenting the raw uint8 wire format then normalizing equals
        normalizing then augmenting — nearest resampling is a permutation."""
        b, s = 2, 24
        inp8 = rng.integers(0, 256, (b, s, s, 3)).astype(np.uint8)
        mask8 = (rng.uniform(size=(b, s, s, 1)) < 0.9).astype(np.uint8)
        key = jax.random.PRNGKey(7)
        a8, b8, m8 = cdata.augment_batch(
            jnp.asarray(inp8), jnp.asarray(inp8), jnp.asarray(mask8), key
        )
        af, bf, mf = cdata.augment_batch(
            jnp.asarray(inp8, jnp.float32) / 255.0,
            jnp.asarray(inp8, jnp.float32) / 255.0,
            jnp.asarray(mask8, jnp.float32),
            key,
        )
        assert a8.dtype == jnp.uint8
        np.testing.assert_allclose(
            np.asarray(a8, np.float32) / 255.0, np.asarray(af), atol=1e-7
        )
        np.testing.assert_array_equal(
            np.asarray(m8).astype(np.float32), np.asarray(mf)
        )

    def test_distinct_keys_give_distinct_augs(self, rng):
        inp = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        mask = jnp.ones((1, 32, 32, 1), jnp.float32)
        a1, *_ = cdata.augment_batch(inp, inp, mask, jax.random.PRNGKey(1))
        a2, *_ = cdata.augment_batch(inp, inp, mask, jax.random.PRNGKey(2))
        assert float(jnp.abs(a1 - a2).max()) > 0


class TestLoader:
    def test_batches_and_shapes(self, mini_dataset):
        records = cdata.scan_data_dir(mini_dataset)
        recs = cdata.select_records(
            records, cdata.read_split_ids(mini_dataset / "images_train.txt")
        )
        loader = cdata.Loader(recs, batch_size=2, crop=(32, 32), train=True, seed=1)
        batches = list(loader)
        assert len(batches) == 2  # 4 train examples / batch 2
        for b in batches:
            assert b["input_img"].shape == (2, 32, 32, 3)
            assert b["mask"].shape == (2, 32, 32, 1)
            assert len(b["name"]) == 2

    def test_epoch_reshuffle(self, mini_dataset):
        records = cdata.scan_data_dir(mini_dataset)
        recs = cdata.select_records(
            records, cdata.read_split_ids(mini_dataset / "images_train.txt")
        )
        loader = cdata.Loader(recs, batch_size=4, crop=(16, 16), train=True, seed=1)
        loader.set_epoch(0)
        names0 = [n for b in loader for n in b["name"]]
        loader.set_epoch(3)
        names3 = [n for b in loader for n in b["name"]]
        assert sorted(names0) == sorted(names3)
        assert names0 != names3  # reshuffled

    def test_eval_partial_batch_wraps_with_count(self, mini_dataset):
        records = cdata.scan_data_dir(mini_dataset)
        recs = cdata.select_records(records, ["1", "2", "3"])
        loader = cdata.Loader(recs, batch_size=2, crop=(16, 16), train=False)
        batches = list(loader)
        assert len(batches) == 2
        assert int(batches[0]["valid_count"]) == 2
        assert int(batches[1]["valid_count"]) == 1

    def test_decoded_cache_identical_and_skips_decode(self, mini_dataset, monkeypatch):
        """cache_mb>0 must not change any batch, and the second epoch must
        not hit the decoder for cached images (first-N-that-fit policy)."""
        records = cdata.scan_data_dir(mini_dataset)
        recs = cdata.select_records(
            records, cdata.read_split_ids(mini_dataset / "images_train.txt")
        )
        from curl_tpu.data import dataset as ds, pipeline

        calls = {"n": 0}
        real_load = ds.load_example

        def counting_load(rec):
            calls["n"] += 1
            return real_load(rec)

        monkeypatch.setattr(pipeline.ds, "load_example", counting_load)
        plain = cdata.Loader(recs, batch_size=2, crop=(32, 32), train=True, seed=3)
        cached = cdata.Loader(
            recs, batch_size=2, crop=(32, 32), train=True, seed=3, cache_mb=256
        )
        for ep in range(2):
            plain.set_epoch(ep)
            cached.set_epoch(ep)
            for bp, bc in zip(plain, cached):
                assert bp["name"] == bc["name"]
                np.testing.assert_array_equal(bp["input_img"], bc["input_img"])
                np.testing.assert_array_equal(bp["output_img"], bc["output_img"])
        # plain decodes every image both epochs (2n); cached decodes each
        # image exactly once (n) and serves epoch 1 from RAM.
        n = len(recs)
        assert calls["n"] == 2 * n + n

    def test_process_sharding_partitions_batch(self, mini_dataset):
        records = cdata.scan_data_dir(mini_dataset)
        recs = cdata.select_records(records, ["1", "2", "3", "a0004"])
        shards = []
        for pi in range(2):
            loader = cdata.Loader(
                recs, batch_size=4, crop=(16, 16), train=False,
                process_index=pi, process_count=2,
            )
            shards.append(next(iter(loader)))
        names = shards[0]["name"] + shards[1]["name"]
        assert sorted(names) == sorted(f"{r.key}.png" for r in recs)


class TestMultiHostInputPath:
    """End-to-end multi-host input assembly on the virtual mesh: two
    process-local Loaders (process_count=2) -> shard_batch
    (jax.make_array_from_process_local_data) -> jitted steps, equal to the
    single-loader result (role of the reference's DistributedSampler + DDP
    input path, main.py:212-218)."""

    def _global_batch(self, mini_dataset, process_count):
        records = cdata.scan_data_dir(mini_dataset)
        recs = cdata.select_records(records, ["1", "2", "3", "a0004", "a0005"])
        shards = []
        for pi in range(process_count):
            loader = cdata.Loader(
                recs, batch_size=8, crop=(16, 16), train=False,
                process_index=pi, process_count=process_count,
            )
            shards.append(next(iter(loader)))
        # Global batch = process shards in process order (exactly the layout
        # jax.make_array_from_process_local_data assembles when each process
        # passes its local rows).
        batch = {
            k: np.concatenate([s[k] for s in shards])
            for k in ("input_img", "output_img", "mask")
        }
        batch["valid_count"] = shards[0]["valid_count"]
        for s in shards[1:]:  # replicated scalar must agree across processes
            assert int(s["valid_count"]) == int(batch["valid_count"])
        batch["name"] = [n for s in shards for n in s["name"]]
        return batch

    def test_two_process_shards_equal_single_loader_through_steps(self, mini_dataset):
        from curl_tpu import models
        from curl_tpu.parallel import mesh as mesh_lib
        from curl_tpu.train import state as state_lib
        from curl_tpu.train import steps as steps_lib

        mesh = mesh_lib.local_mesh_cpu(8)
        bsh = mesh_lib.batch_sharding(mesh)

        two = self._global_batch(mini_dataset, process_count=2)
        one = self._global_batch(mini_dataset, process_count=1)
        assert two["name"] == one["name"]
        assert int(two["valid_count"]) == 5  # 5 records, batch 8 -> 3 wrapped
        for k in ("input_img", "output_img", "mask"):
            np.testing.assert_array_equal(two[k], one[k])

        model = models.TriSpacePolyNet(backbone="tiny")
        tx = state_lib.make_optimizer(state_lib.onecycle_schedule(10, 2))
        state = state_lib.create_train_state(
            model, jax.random.PRNGKey(0),
            np.zeros((1, 16, 16, 3), np.float32),
            np.ones((1, 16, 16, 1), np.float32), tx,
        )
        state = mesh_lib.shard_pytree(state, mesh_lib.replicated(mesh))

        def run(batch_np, step, *args):
            batch_np = dict(batch_np)
            batch_np.pop("name")  # host-only metadata, not a step input
            batch = cdata.shard_batch(batch_np, bsh)
            assert batch["input_img"].sharding.is_equivalent_to(bsh, 4)
            return step(state, batch, *args)

        estep = steps_lib.make_eval_step()
        stats2 = run(dict(two), estep)
        stats1 = run(dict(one), estep)
        assert float(stats2["count"]) == 5.0
        for k in ("loss_sum", "psnr_sum", "msssim_sum", "count"):
            np.testing.assert_allclose(
                float(stats2[k]), float(stats1[k]), rtol=1e-5, atol=1e-6
            )

        tstep = steps_lib.make_train_step(augment=False)
        # Re-create states: train_step donates its input state.
        s2, tstats2 = run(dict(two), tstep, jax.random.PRNGKey(1))
        state = state_lib.create_train_state(
            model, jax.random.PRNGKey(0),
            np.zeros((1, 16, 16, 3), np.float32),
            np.ones((1, 16, 16, 1), np.float32), tx,
        )
        state = mesh_lib.shard_pytree(state, mesh_lib.replicated(mesh))
        s1, tstats1 = run(dict(one), tstep, jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(tstats2["loss"]), float(tstats1["loss"]), rtol=1e-6)
        l2 = jax.tree_util.tree_leaves(s2.params)[0]
        l1 = jax.tree_util.tree_leaves(s1.params)[0]
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=1e-7)
