"""The reference as REFEREE on *trained* outputs (VERDICT r3 item 3).

Composed-forward parity (tests/test_composed_parity.py) and metric parity
(tests/test_ssim.py, tests/test_losses.py) pin the pieces on synthetic
tensors; this closes the last self-referential link in the quality loop:
a REAL trained curl_tpu checkpoint's coefficients are handed to the
reference's own `TriSpaceRegNet.forward` (/root/reference/model.py:529-535)
on the bundled example pairs, the reference enhances and scores them with
ITS `CURLLoss`/`PSNRMetric`/`MSSSIMMetric` (/root/reference/
evaluate.py:102-105), and those scores must agree with what our eval step —
the exact code the CLI reports from — says about the same checkpoint on the
same pixels (<=0.05 dB).

The torch side cannot run the conv backbone (timm is not installed — the
oracle stubs it), so both sides consume the SAME trained coefficient
vectors; the backbone conversion itself is pinned by
tests/test_timm_convert.py and the trained-checkpoint round-trip test below.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curl_tpu.models import TriSpacePolyNet
from curl_tpu.train import state as state_lib
from curl_tpu.train import steps as steps_lib

from reference_oracle import load, requires_reference
from test_composed_parity import _FlatBackbone, _nchw, _nhwc

torch = pytest.importorskip("torch")

_DPE = "/root/reference/adobe5k_dpe"
_IN = os.path.join(_DPE, "curl_example_test_input")
_GT = os.path.join(_DPE, "curl_example_test_output")

requires_artifacts = pytest.mark.skipif(
    not os.path.isdir(_IN), reason="bundled adobe5k_dpe examples not available"
)

CROP = 192  # the torch reference materializes (126,5,H,W) per image — keep RAM sane


def _load_pairs(n: int):
    """(input, ground-truth) center crops of the first n bundled pairs."""
    from PIL import Image

    from curl_tpu.infer.engine import center_crop

    pairs = []
    for gt_name in sorted(os.listdir(_GT)):
        stem = os.path.splitext(gt_name)[0]
        inputs = [f for f in os.listdir(_IN) if f.startswith(stem)]
        if not inputs:
            continue
        inp = np.asarray(Image.open(os.path.join(_IN, inputs[0])).convert("RGB"), np.float32) / 255.0
        gt = np.asarray(Image.open(os.path.join(_GT, gt_name)).convert("RGB"), np.float32) / 255.0
        h = min(inp.shape[0], gt.shape[0])
        w = min(inp.shape[1], gt.shape[1])
        pairs.append((center_crop(inp[:h, :w], CROP), center_crop(gt[:h, :w], CROP)))
        if len(pairs) == n:
            break
    return pairs


@pytest.fixture(scope="module")
def trained():
    """A genuinely TRAINED checkpoint (not init): a tiny-backbone model
    stepped on real bundled pixels until the coefficients are non-trivial."""
    pairs = _load_pairs(4)
    if not pairs:
        pytest.skip("bundled example pairs unavailable")
    net = TriSpacePolyNet(backbone="tiny")
    inp = jnp.asarray(np.stack([p[0] for p in pairs]))
    out = jnp.asarray(np.stack([p[1] for p in pairs]))
    mask = jnp.ones(inp.shape[:3] + (1,), jnp.float32)
    tx = state_lib.make_optimizer(state_lib.onecycle_schedule(8, 2, peak_lr=1e-3))
    state = state_lib.create_train_state(net, jax.random.PRNGKey(0), inp[:1], mask[:1], tx)
    step = steps_lib.make_train_step(augment=False)
    batch = {
        "input_img": inp, "output_img": out, "mask": mask,
        "valid_count": jnp.asarray(inp.shape[0]),
    }
    losses = []
    for i in range(8):
        state, stats = step(state, dict(batch), jax.random.PRNGKey(i))
        losses.append(float(stats["loss"]))
    assert np.isfinite(losses).all() and losses[-1] != losses[0], "training moved"
    return net, state


@requires_reference
@requires_artifacts
class TestReferenceReferee:
    def _both_scores(self, net, state, img: np.ndarray, gt: np.ndarray):
        """(our-eval-step metrics, reference-scored metrics) for one pair."""
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        imgj = jnp.asarray(img[None])
        gtj = jnp.asarray(gt[None])
        maskj = jnp.ones(imgj.shape[:3] + (1,), jnp.float32)

        # OUR side: the exact eval step the Evaluator/CLI reports from.
        eval_step = steps_lib.make_eval_step()
        batch = {
            "input_img": imgj, "output_img": gtj, "mask": maskj,
            "valid_count": jnp.asarray(1),
        }
        stats = eval_step(state.replace(apply_fn=net.apply), batch)
        ours = {
            "loss": float(stats["loss_sum"]),
            "psnr": float(stats["psnr_sum"]),
            "msssim": float(stats["msssim_sum"]),
        }
        our_enhanced = np.asarray(stats["enhanced"][0])

        # REFEREE side: same trained coefficients -> the reference's OWN
        # forward (reshape/split + composition, model.py:522-535) and ITS
        # loss/metric stack (evaluate.py:102-105).
        r, l, h = net.apply(variables, imgj, maskj, method=net.generate_coefficients)
        flat = np.stack([np.asarray(r), np.asarray(l), np.asarray(h)], axis=1).reshape(1, -1)
        ref_model = load("model")
        ref_metric = load("metric")
        with torch.no_grad():
            ref_net = ref_model.TriSpaceRegNet(polynomial_order=4, spatial=True, is_train=True)
            ref_net.backbone = _FlatBackbone(flat)
            timg, tgt = _nchw(img[None]), _nchw(gt[None])
            tmask = torch.ones((1, 1) + img.shape[:2])
            ref_out = ref_net(timg, tmask)
            criterion = ref_model.CURLLoss(ssim_window_size=5)
            ref = {
                "loss": float(criterion(ref_out, tgt, tmask)),
                "psnr": float(ref_metric.PSNRMetric()(tgt, ref_out, tmask)),
                "msssim": float(
                    ref_metric.MSSSIMMetric()(tgt * tmask, ref_out * tmask).mean()
                ),
            }
        return ours, ref, our_enhanced, _nhwc(ref_out)[0]

    def test_reference_scores_match_ours(self, trained):
        """The referee loop: over bundled pairs, |our PSNR - the reference's
        PSNR of the same trained model| <= 0.05 dB; loss and MS-SSIM agree to
        1e-3. Today's quality claims are no longer scored only by our own
        metric stack."""
        net, state = trained
        pairs = _load_pairs(3)
        for i, (img, gt) in enumerate(pairs):
            ours, ref, our_img, ref_img = self._both_scores(net, state, img, gt)
            assert abs(ours["psnr"] - ref["psnr"]) <= 0.05, (i, ours, ref)
            assert abs(ours["loss"] - ref["loss"]) <= 1e-3, (i, ours, ref)
            assert abs(ours["msssim"] - ref["msssim"]) <= 1e-3, (i, ours, ref)
            # The enhanced pixels themselves agree (not just their scores).
            assert np.abs(our_img - ref_img).max() <= 5e-4, i

    def test_trained_checkpoint_roundtrips_through_torch_layout(self, trained):
        """export_trispace_state_dict on a TRAINED checkpoint (it was only
        shape-tested before — VERDICT r3 missing #3): export -> re-import ->
        identical enhanced image."""
        from curl_tpu.export import torch_convert as tc
        from curl_tpu.models import backbone as bb

        net, state = trained
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        cfg = bb.CONFIGS["tiny"]
        sd = tc.export_trispace_state_dict(variables, cfg)
        re_vars = tc.convert_trispace_state_dict(sd, cfg)

        img, gt = _load_pairs(1)[0]
        imgj = jnp.asarray(img[None])
        maskj = jnp.ones(imgj.shape[:3] + (1,), jnp.float32)
        a = np.asarray(net.apply(variables, imgj, maskj))
        b = np.asarray(net.apply(re_vars, imgj, maskj))
        np.testing.assert_array_equal(a, b)
