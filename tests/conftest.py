"""Test harness configuration.

Tests run on CPU with 8 virtual devices — the idiomatic JAX way to exercise
multi-chip sharding (mesh/pjit/psum paths) without TPU hardware. Must set the
flags before jax initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep fp32 matmuls exact on CPU for parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

# The TPU plugin in this environment ignores JAX_PLATFORMS; the config knob
# is authoritative. Tests must run on the virtual 8-device CPU topology.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the expensive jit programs (train/eval steps,
# backbones) dominate suite time on slow hosts; caching compiled executables
# across runs cut a representative test 1m42s -> 33s (measured round 4).
# Keyed by HLO + flags, so it cannot change numerics.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("CURL_TPU_TEST_CACHE", "/tmp/jax_cache_curl_tpu_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
