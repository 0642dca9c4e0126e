"""Loader for the PyTorch reference implementation as a *test oracle*.

When the read-only reference checkout exists (development environments only),
parity tests compare our JAX ops' outputs against the reference's to fp32
bit-level tolerance. The reference is never imported by the framework itself,
and all tests using it skip cleanly when it is absent.

The reference's heavyweight/unavailable deps (timm, torchvision, CUDA) are
stubbed: we only exercise pure-math code paths (colors, curves, poly layers,
metrics) which depend on torch alone.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import pytest

REFERENCE_DIR = Path("/root/reference")


def reference_available() -> bool:
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return (REFERENCE_DIR / "colors.py").is_file()


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="PyTorch reference checkout not available"
)


def _stub_module(name: str, **attrs) -> None:
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def _install_stubs() -> None:
    import torch

    # timm / torchvision are not installed. `create_model` returns a bare
    # torch Module so classes that build a backbone in __init__ (e.g.
    # TriSpaceRegNet, model.py:456-463 — it assigns `.classifier` onto the
    # result) can instantiate; the stub backbone's forward is never invoked
    # by the composed-parity tests (they drive generate_residual directly,
    # or replace `net.backbone` with a fixed-output module).
    _stub_module("timm", create_model=lambda *a, **k: __import__("torch").nn.Module())
    _stub_module("torchvision")
    _stub_module("torchvision.models")
    _stub_module("torchvision.transforms", Compose=object)
    _stub_module("torchvision.transforms.functional")
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    # The reference's MSSSIM hard-codes `.cuda()` (metric.py:116,152-157);
    # make it a no-op so the math runs on CPU-only torch.
    if not getattr(torch.Tensor.cuda, "_curl_tpu_noop", False):
        def _cuda_noop(self, *a, **k):
            return self

        _cuda_noop._curl_tpu_noop = True
        torch.Tensor.cuda = _cuda_noop


_cache: dict[str, object] = {}


def load(name: str):
    """Import a reference module (colors / curves / metric / model / data /
    transpose) under the alias `ref_<name>`."""
    if name in _cache:
        return _cache[name]
    _install_stubs()
    path = REFERENCE_DIR / f"{name}.py"
    # Reference modules import each other by bare name; make them resolvable.
    for dep in ("colors", "curves", "metric", "transpose"):
        dep_alias = f"ref_{dep}"
        if dep != name and dep_alias not in sys.modules and (REFERENCE_DIR / f"{dep}.py").exists():
            pass  # loaded lazily below via sys.path
    sys.path.insert(0, str(REFERENCE_DIR))
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(str(REFERENCE_DIR))
    _cache[name] = mod
    return mod
