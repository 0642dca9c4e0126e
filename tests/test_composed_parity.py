"""Composed-model forward parity against the reference's OWN composition.

Every primitive (colors, poly, curves, ssim, loss) is parity-pinned
elsewhere; these tests close the last link: the reference's *composed*
`TriSpaceRegNet.generate_residual` / `forward` (/root/reference/
model.py:474-535) — coefficient split order R/L/H (model.py:527), the
x/width, y/height coordinate normalization in `cat_coords` (model.py:494-496),
the sigmoid -> convert-back -> 2(x-0.5) -> sum chain (model.py:503-515), and
the residual-vs-clamped `final_op` switch (model.py:484) — run against this
framework's `enhance.trispace_residual` / `TriSpacePolyNet` on identical
coefficients. Non-square shapes throughout so any H/W or x/y transposition
fails.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curl_tpu.models import TriSpacePolyNet
from curl_tpu.ops import enhance

from reference_oracle import load, requires_reference

torch = pytest.importorskip("torch")

ATOL = 5e-5


def _nchw(a: np.ndarray) -> "torch.Tensor":
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


def _nhwc(t: "torch.Tensor") -> np.ndarray:
    return t.detach().cpu().numpy().transpose(0, 2, 3, 1)


def _coeffs(rng, b: int, n: int, scale: float = 0.15):
    return tuple(
        rng.normal(0.0, scale, (b, 3, n)).astype(np.float32) for _ in range(3)
    )


def _ref_net(**kw):
    ref_model = load("model")
    with torch.no_grad():
        return ref_model.TriSpaceRegNet(polynomial_order=4, **kw)


class _FlatBackbone(torch.nn.Module):
    """Stands in for the timm backbone+classifier: returns a fixed flat
    coefficient vector so `generate_coefficients`'s reshape/split
    (model.py:522-527) runs on known values."""

    def __init__(self, vec: np.ndarray):
        super().__init__()
        self.vec = torch.nn.Parameter(torch.from_numpy(vec), requires_grad=False)

    def forward(self, x):
        return self.vec.expand(x.shape[0], -1)


def _head_forced_variables(net: TriSpacePolyNet, variables, flat_vec: np.ndarray):
    """Variables whose MLP head ignores its input and emits `flat_vec`:
    zero every head kernel and set the last bias to the vector. The model's
    own reshape/split then runs on known coefficients."""
    import flax

    flat = flax.traverse_util.flatten_dict(variables["params"], sep="/")
    head_keys = sorted(k for k in flat if k.startswith("head/") and k.endswith("/kernel"))
    assert head_keys, "head kernels not found"
    for k in head_keys:
        flat[k] = np.zeros_like(np.asarray(flat[k]))
        bk = k[: -len("kernel")] + "bias"
        flat[bk] = np.zeros_like(np.asarray(flat[bk]))
    last_bias = head_keys[-1][: -len("kernel")] + "bias"
    assert np.asarray(flat[last_bias]).shape == flat_vec.shape
    flat[last_bias] = flat_vec
    params = flax.traverse_util.unflatten_dict(flat, sep="/")
    return {"params": params, "batch_stats": variables["batch_stats"]}


@requires_reference
class TestGenerateResidualParity:
    def test_spatial_nonsquare(self, rng):
        net = _ref_net(spatial=True)
        img = rng.uniform(0, 1, (2, 37, 53, 3)).astype(np.float32)
        R, L, H = _coeffs(rng, 2, net.num_coeffs)
        with torch.no_grad():
            ref = _nhwc(
                net.generate_residual(_nchw(img), *(torch.from_numpy(c) for c in (R, L, H)))
            )
        ours = np.asarray(
            enhance.trispace_residual(
                jnp.asarray(img), jnp.asarray(R), jnp.asarray(L), jnp.asarray(H),
                degree=4, spatial=True,
            )
        )
        np.testing.assert_allclose(ours, ref, atol=ATOL)

    def test_nonspatial(self, rng):
        net = _ref_net(spatial=False)
        img = rng.uniform(0, 1, (1, 21, 34, 3)).astype(np.float32)
        R, L, H = _coeffs(rng, 1, net.num_coeffs)
        with torch.no_grad():
            ref = _nhwc(
                net.generate_residual(_nchw(img), *(torch.from_numpy(c) for c in (R, L, H)))
            )
        ours = np.asarray(
            enhance.trispace_residual(
                jnp.asarray(img), jnp.asarray(R), jnp.asarray(L), jnp.asarray(H),
                degree=4, spatial=False,
            )
        )
        np.testing.assert_allclose(ours, ref, atol=ATOL)

    def test_pallas_interpret_against_reference(self, rng):
        """The fused-kernel math (interpret mode on CPU) against the
        reference composition directly — previously Pallas was only compared
        to this repo's own XLA path."""
        net = _ref_net(spatial=True)
        img = rng.uniform(0, 1, (1, 16, 128, 3)).astype(np.float32)
        R, L, H = _coeffs(rng, 1, net.num_coeffs)
        with torch.no_grad():
            ref = _nhwc(
                net.generate_residual(_nchw(img), *(torch.from_numpy(c) for c in (R, L, H)))
            )
        from jax.experimental import pallas as _  # noqa: F401
        import jax.experimental.pallas.tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            ours = np.asarray(
                enhance.trispace_residual(
                    jnp.asarray(img), jnp.asarray(R), jnp.asarray(L), jnp.asarray(H),
                    degree=4, spatial=True, impl="pallas",
                )
            )
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_swapped_spaces_fail(self, rng):
        """Teeth check: a transposed coefficient split (L<->H) must NOT pass,
        i.e. this harness would catch the bug class it exists for."""
        net = _ref_net(spatial=True)
        img = rng.uniform(0, 1, (1, 19, 27, 3)).astype(np.float32)
        R, L, H = _coeffs(rng, 1, net.num_coeffs)
        with torch.no_grad():
            ref = _nhwc(
                net.generate_residual(_nchw(img), *(torch.from_numpy(c) for c in (R, L, H)))
            )
        swapped = np.asarray(
            enhance.trispace_residual(
                jnp.asarray(img), jnp.asarray(R), jnp.asarray(H), jnp.asarray(L),
                degree=4, spatial=True,
            )
        )
        assert np.abs(swapped - ref).max() > 1e-2

    def test_coordinate_offset_teeth(self, rng):
        """An off-by-one in the coordinate planes must exceed tolerance."""
        net = _ref_net(spatial=True)
        img = rng.uniform(0, 1, (1, 19, 27, 3)).astype(np.float32)
        R, L, H = _coeffs(rng, 1, net.num_coeffs, scale=0.3)
        with torch.no_grad():
            ref = _nhwc(
                net.generate_residual(_nchw(img), *(torch.from_numpy(c) for c in (R, L, H)))
            )
        shifted = np.asarray(
            enhance.trispace_residual(
                jnp.asarray(img), jnp.asarray(R), jnp.asarray(L), jnp.asarray(H),
                degree=4, spatial=True, tile=(1, 1, 19, 27),
            )
        )
        assert np.abs(shifted - ref).max() > ATOL


@requires_reference
class TestForwardParity:
    """Full `forward` through the reference's generate_coefficients
    reshape/split and final_op, vs TriSpacePolyNet with its head forced to
    the same flat coefficient vector."""

    @pytest.fixture(scope="class")
    def tiny(self):
        net = TriSpacePolyNet(backbone="tiny")
        img = jnp.zeros((1, 32, 48, 3))
        mask = jnp.ones((1, 32, 48, 1))
        variables = net.init(jax.random.PRNGKey(0), img, mask)
        return net, variables

    def _both(self, rng, tiny, is_train: bool, full_res=None):
        net, variables = tiny
        flat = rng.normal(0.0, 0.15, (3 * 3 * net.num_coeffs,)).astype(np.float32)
        img = rng.uniform(0, 1, (2, 32, 48, 3)).astype(np.float32)
        mask = (rng.uniform(0, 1, (2, 32, 48, 1)) > 0.3).astype(np.float32)

        ref_net = _ref_net(spatial=True, is_train=is_train)
        ref_net.backbone = _FlatBackbone(flat[None])
        targs = [_nchw(img), _nchw(mask)]
        ours_kw = {}
        if full_res is not None:
            target = rng.uniform(0, 1, (2,) + full_res + (3,)).astype(np.float32)
            targs.append(_nchw(target))
            ours_kw["target_img"] = jnp.asarray(target)
        with torch.no_grad():
            ref = _nhwc(ref_net(*targs))

        forced = _head_forced_variables(net, variables, flat)
        ours = np.asarray(
            net.apply(
                forced, jnp.asarray(img), jnp.asarray(mask),
                return_residual=not is_train, **ours_kw,
            )
        )
        return ours, ref

    def test_train_mode_clamped_image(self, rng, tiny):
        ours, ref = self._both(rng, tiny, is_train=True)
        np.testing.assert_allclose(ours, ref, atol=ATOL)

    def test_eval_mode_raw_residual(self, rng, tiny):
        ours, ref = self._both(rng, tiny, is_train=False)
        np.testing.assert_allclose(ours, ref, atol=ATOL)

    def test_low_res_predict_full_res_apply(self, rng, tiny):
        # The deployment hook: coefficients from 32x48, residual on 40x56
        # (reference model.py:529-535 `target_img`).
        ours, ref = self._both(rng, tiny, is_train=False, full_res=(40, 56))
        np.testing.assert_allclose(ours, ref, atol=ATOL)
