"""Row-sharded (pixel-space sequence-parallel) apply tests on the 8-device
CPU mesh."""

import numpy as np
import pytest

import jax.numpy as jnp

from curl_tpu.ops import enhance
from curl_tpu.parallel import mesh as mesh_lib
from curl_tpu.parallel.spatial import shard_rows, sharded_trispace_residual


def _coeffs(rng, b=1, n=126):
    return [
        jnp.asarray(rng.normal(scale=0.2, size=(b, 3, n)).astype(np.float32))
        for _ in range(3)
    ]


class TestShardedApply:
    def test_matches_unsharded(self, rng):
        mesh = mesh_lib.local_mesh_cpu(8)
        img = jnp.asarray(rng.uniform(0, 1, (2, 64, 48, 3)).astype(np.float32))
        cs = _coeffs(rng, b=2)
        ref = enhance.trispace_residual(img, *cs, impl="xla")
        got = sharded_trispace_residual(mesh, shard_rows(mesh, img), *cs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    def test_pads_indivisible_rows(self, rng):
        mesh = mesh_lib.local_mesh_cpu(8)
        # 50 rows do not divide onto 8 shards; pad must be stripped and the
        # coordinate planes must still be global.
        img = jnp.asarray(rng.uniform(0, 1, (1, 50, 40, 3)).astype(np.float32))
        cs = _coeffs(rng)
        ref = enhance.trispace_residual(img, *cs, impl="xla")
        got = sharded_trispace_residual(mesh, img, *cs)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    def test_non_spatial_polynomials(self, rng):
        mesh = mesh_lib.local_mesh_cpu(8)
        img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        cs = _coeffs(rng, n=35)
        ref = enhance.trispace_residual(img, *cs, spatial=False, impl="xla")
        got = sharded_trispace_residual(mesh, img, *cs, spatial=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
