"""PyTorch reference checkpoint -> curl_tpu parameter converter.

Plays the role of the reference's `convert_state.py` (DP/DDP-prefix
stripping + legacy reshapes, convert_state.py:4-16) for migrating trained
TriSpaceRegNet checkpoints into this framework. The mapping covers the timm
EfficientNetV2 naming used by the reference backbone plus its replaced
classifier head; the color-matrix constant buffers (`rgb2lab.*`, `lab2rgb.*`)
and the coordinate buffers (`x`, `y`) are validated/ignored — they are
compile-time constants here.

Weight layout transforms (torch -> flax):
  conv      (O, I, kh, kw)  -> (kh, kw, I, O)
  depthwise (C, 1, kh, kw)  -> (kh, kw, 1, C)
  linear    (O, I)          -> (I, O)
  batchnorm weight/bias/running_mean/running_var -> scale/bias + mean/var

The converter reports all missing/unexpected keys at once; array *shape*
validation against a freshly initialized model happens in the conversion
CLI (`curl_tpu.cli.convert._validate_shapes`), so a mismatched architecture
fails loudly rather than surfacing as a cryptic apply()-time error.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from curl_tpu.models import backbone as bb
from curl_tpu.ops import poly


def strip_ddp_prefix(state_dict: Mapping[str, Any]) -> dict[str, Any]:
    """Remove the DataParallel/DistributedDataParallel 'module.' prefix
    (reference convert_state.py:9)."""
    return {
        (k[7:] if k.startswith("module.") else k): v for k, v in state_dict.items()
    }


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _conv(v) -> np.ndarray:
    return _to_np(v).transpose(2, 3, 1, 0)


def _linear(v) -> np.ndarray:
    return _to_np(v).transpose(1, 0)


class _TreeBuilder:
    def __init__(self):
        self.params: dict = {}
        self.batch_stats: dict = {}
        self.errors: list[str] = []

    def set(self, tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv(self, sd, torch_key, *flax_path):
        self._assign(sd, torch_key + ".weight", flax_path + ("kernel",), _conv)

    def linear(self, sd, torch_key, *flax_path):
        self._assign(sd, torch_key + ".weight", flax_path + ("kernel",), _linear)
        self._assign(sd, torch_key + ".bias", flax_path + ("bias",), _to_np)

    def conv_bias(self, sd, torch_key, *flax_path):
        self._assign(sd, torch_key + ".weight", flax_path + ("kernel",), _conv)
        self._assign(sd, torch_key + ".bias", flax_path + ("bias",), _to_np)

    def bn(self, sd, torch_key, *flax_path):
        self._assign(sd, torch_key + ".weight", flax_path + ("scale",), _to_np)
        self._assign(sd, torch_key + ".bias", flax_path + ("bias",), _to_np)
        self._assign(
            sd, torch_key + ".running_mean", flax_path + ("mean",), _to_np, stats=True
        )
        self._assign(
            sd, torch_key + ".running_var", flax_path + ("var",), _to_np, stats=True
        )

    def _assign(self, sd, torch_key, flax_path, transform, stats=False):
        if torch_key not in sd:
            self.errors.append(f"missing torch key: {torch_key}")
            return
        self.set(self.batch_stats if stats else self.params, flax_path, transform(sd[torch_key]))


def _map_backbone(builder: _TreeBuilder, sd: Mapping, cfg: bb.BackboneCfg, prefix: str, scope: str) -> set[str]:
    """Map one timm EfficientNetV2 feature extractor. Returns consumed keys."""
    consumed: set[str] = set()

    def conv(tk, *fp):
        builder.conv(sd, prefix + tk, scope, *fp)
        consumed.add(prefix + tk + ".weight")

    def conv_bias(tk, *fp):
        builder.conv_bias(sd, prefix + tk, scope, *fp)
        consumed.update({prefix + tk + ".weight", prefix + tk + ".bias"})

    def bn(tk, *fp):
        builder.bn(sd, prefix + tk, scope, *fp)
        consumed.update(
            prefix + tk + s
            for s in (".weight", ".bias", ".running_mean", ".running_var")
        )
        consumed.add(prefix + tk + ".num_batches_tracked")  # torch extra

    conv("conv_stem", "stem_conv")
    bn("bn1", "stem_bn")
    for si, stage in enumerate(cfg.blocks):
        for bi in range(stage.repeats):
            t = f"blocks.{si}.{bi}."
            f = f"stage{si}_block{bi}"
            if stage.kind == "cn":
                conv(t + "conv", f, "conv")
                bn(t + "bn1", f, "bn")
            elif stage.kind == "er":
                conv(t + "conv_exp", f, "conv_exp")
                bn(t + "bn1", f, "bn1")
                conv(t + "conv_pwl", f, "conv_pwl")
                bn(t + "bn2", f, "bn2")
            else:  # ir
                conv(t + "conv_pw", f, "conv_pw")
                bn(t + "bn1", f, "bn1")
                conv(t + "conv_dw", f, "conv_dw")
                bn(t + "bn2", f, "bn2")
                if stage.se_ratio > 0:
                    conv_bias(t + "se.conv_reduce", f, "se", "reduce")
                    conv_bias(t + "se.conv_expand", f, "se", "expand")
                conv(t + "conv_pwl", f, "conv_pwl")
                bn(t + "bn3", f, "bn3")
    conv("conv_head", "head_conv")
    bn("bn2", "head_bn")
    return consumed


def timm_key_shapes(
    cfg: bb.BackboneCfg, num_classes: int = 1000
) -> dict[str, tuple[int, ...]]:
    """The expected key -> shape inventory of a raw timm EfficientNetV2
    state_dict (e.g. `efficientnetv2_rw_t` ImageNet weights, the model the
    reference fine-tunes from — reference model.py:456 `pretrained=True`),
    derived by replaying the block channel flow.

    Pinned as committed JSON fixtures under tests/fixtures/ so any topology
    drift between this backbone and real timm (stride placement, SE
    reduction base, head layout) fails in CI instead of at a user's
    conversion time.
    """
    shapes: dict[str, tuple[int, ...]] = {}

    def bn(key: str, ch: int) -> None:
        for s in ("weight", "bias", "running_mean", "running_var"):
            shapes[f"{key}.{s}"] = (ch,)
        shapes[f"{key}.num_batches_tracked"] = ()

    shapes["conv_stem.weight"] = (cfg.stem_channels, 3, 3, 3)
    bn("bn1", cfg.stem_channels)
    in_ch = cfg.stem_channels
    for si, stage in enumerate(cfg.blocks):
        for bi in range(stage.repeats):
            t = f"blocks.{si}.{bi}"
            k, out = stage.kernel, stage.channels
            mid = in_ch * stage.expand
            if stage.kind == "cn":
                shapes[f"{t}.conv.weight"] = (out, in_ch, k, k)
                bn(f"{t}.bn1", out)
            elif stage.kind == "er":
                shapes[f"{t}.conv_exp.weight"] = (mid, in_ch, k, k)
                bn(f"{t}.bn1", mid)
                shapes[f"{t}.conv_pwl.weight"] = (out, mid, 1, 1)
                bn(f"{t}.bn2", out)
            else:  # ir
                shapes[f"{t}.conv_pw.weight"] = (mid, in_ch, 1, 1)
                bn(f"{t}.bn1", mid)
                shapes[f"{t}.conv_dw.weight"] = (mid, 1, k, k)
                bn(f"{t}.bn2", mid)
                if stage.se_ratio > 0:
                    # timm SE reduction is computed from the block INPUT
                    # width (reduced_base_chs=in_chs), not the expanded one.
                    red = max(1, int(in_ch * stage.se_ratio))
                    shapes[f"{t}.se.conv_reduce.weight"] = (red, mid, 1, 1)
                    shapes[f"{t}.se.conv_reduce.bias"] = (red,)
                    shapes[f"{t}.se.conv_expand.weight"] = (mid, red, 1, 1)
                    shapes[f"{t}.se.conv_expand.bias"] = (mid,)
                shapes[f"{t}.conv_pwl.weight"] = (out, mid, 1, 1)
                bn(f"{t}.bn3", out)
            in_ch = out
    shapes["conv_head.weight"] = (cfg.num_features, in_ch, 1, 1)
    bn("bn2", cfg.num_features)
    shapes["classifier.weight"] = (num_classes, cfg.num_features)
    shapes["classifier.bias"] = (num_classes,)
    return shapes


def convert_timm_backbone_state_dict(
    state_dict: Mapping[str, Any],
    backbone_cfg: bb.BackboneCfg = bb.EFFICIENTNETV2_RW_T,
) -> dict[str, Any]:
    """Raw timm EfficientNetV2 ImageNet state_dict (NO `backbone.` prefix,
    single-Linear `classifier`) -> {'params': {'backbone_net': ...},
    'batch_stats': {'backbone_net': ...}}.

    This is the pretrained-initialization path: the reference trains from
    timm `pretrained=True` (model.py:456) — its recipe (peak lr 1e-4 on
    2,250 images) only makes sense fine-tuning ImageNet features. The
    classifier head is intentionally NOT converted (our model replaces it
    with the MLP head, freshly initialized).

    Every key must be either consumed or the ImageNet classifier; arrays are
    shape-checked against the expected timm inventory so a topology mismatch
    fails loudly here instead of inside apply().
    """
    sd = strip_ddp_prefix(state_dict)
    # timm .pt files sometimes nest the weights.
    for nest in ("state_dict", "model"):
        if nest in sd and isinstance(sd[nest], Mapping):
            sd = strip_ddp_prefix(sd[nest])

    expected = timm_key_shapes(backbone_cfg)
    builder = _TreeBuilder()
    for k, v in sd.items():
        if k in ("classifier.weight", "classifier.bias"):
            continue
        exp = expected.get(k)
        if exp is not None and tuple(np.shape(_to_np(v))) != exp:
            builder.errors.append(
                f"shape mismatch {k}: checkpoint {tuple(np.shape(_to_np(v)))} "
                f"vs expected timm {exp}"
            )
    consumed = _map_backbone(builder, sd, backbone_cfg, "", "backbone_net")
    consumed.update({"classifier.weight", "classifier.bias"})
    unexpected = sorted(set(sd) - consumed)
    if unexpected:
        builder.errors.append(
            f"unconsumed timm keys: {unexpected[:10]}{'...' if len(unexpected) > 10 else ''}"
        )
    if builder.errors:
        raise ValueError(
            "timm backbone conversion failed:\n  " + "\n  ".join(builder.errors)
        )
    return {"params": builder.params, "batch_stats": builder.batch_stats}


def init_with_pretrained_backbone(model, rng, sample_img, sample_mask, timm_state_dict):
    """Initialize `model` fresh, then overwrite its backbone subtree with
    converted timm ImageNet weights. Head/polynomial params stay at their
    fresh initialization. Returns the full variables dict."""
    import flax

    cfg = model.backbone
    if isinstance(cfg, str):
        cfg = bb.CONFIGS[cfg]
    converted = convert_timm_backbone_state_dict(timm_state_dict, cfg)
    variables = model.init(rng, sample_img, sample_mask)
    variables = flax.core.unfreeze(variables) if hasattr(variables, "unfreeze") else dict(variables)

    # The converter emits the flagship's subtree name ('backbone_net');
    # CurlCurveNet/PolyRegNet name theirs 'backbone'. Re-key to whatever
    # subtree this model actually has.
    model_bb = next(
        (n for n in ("backbone_net", "backbone") if n in variables["params"]), None
    )
    if model_bb is None:
        raise ValueError(
            f"model has no backbone subtree; params keys: {sorted(variables['params'])[:8]}"
        )
    converted = {
        col: {model_bb: tree["backbone_net"]} for col, tree in converted.items()
    }

    def graft(dst: dict, src: dict, col: str) -> None:
        flat_dst = flax.traverse_util.flatten_dict(dst, sep="/")
        flat_src = flax.traverse_util.flatten_dict(src, sep="/")
        missing = [k for k in flat_src if k not in flat_dst]
        if missing:
            raise ValueError(f"{col}: converted keys absent from model: {missing[:10]}")
        for k, v in flat_src.items():
            if tuple(np.shape(flat_dst[k])) != tuple(np.shape(v)):
                raise ValueError(
                    f"{col}/{k}: model {np.shape(flat_dst[k])} vs timm {np.shape(v)}"
                )
            flat_dst[k] = v.astype(np.asarray(flat_dst[k]).dtype)
        dst.clear()
        dst.update(flax.traverse_util.unflatten_dict(flat_dst, sep="/"))

    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    graft(params, converted["params"], "params")
    graft(stats, converted["batch_stats"], "batch_stats")
    variables["params"] = params
    variables["batch_stats"] = stats
    return variables


def convert_trispace_state_dict(
    state_dict: Mapping[str, Any],
    backbone_cfg: bb.BackboneCfg = bb.EFFICIENTNETV2_RW_T,
    polynomial_order: int = 4,
    num_in: int = 5,
) -> dict[str, Any]:
    """torch TriSpaceRegNet state_dict -> {'params': ..., 'batch_stats': ...}
    for `TriSpacePolyNet.apply`. Raises ValueError listing every problem if
    the architectures do not line up."""
    sd = strip_ddp_prefix(state_dict)
    builder = _TreeBuilder()

    consumed = _map_backbone(builder, sd, backbone_cfg, "backbone.", "backbone_net")

    # The replaced classifier: backbone.classifier.{i} Linears
    # (reference model.py:459-463).
    n_fc = 0
    while f"backbone.classifier.{n_fc}.weight" in sd:
        builder.linear(sd, f"backbone.classifier.{n_fc}", "head", f"fc{n_fc}")
        consumed.update(
            {f"backbone.classifier.{n_fc}.weight", f"backbone.classifier.{n_fc}.bias"}
        )
        n_fc += 1
    if n_fc == 0:
        builder.errors.append("missing torch key: backbone.classifier.0.weight")

    # Validate monomial ordering if the checkpoint carries the powers buffer
    # (reference model.py:217,341-343).
    if "polylayer.powers" in sd:
        theirs = _to_np(sd["polylayer.powers"]).astype(np.int64)
        ours = poly.powers_array(polynomial_order, num_in)
        if theirs.shape != ours.shape or not np.array_equal(theirs, ours):
            builder.errors.append(
                "polylayer.powers ordering differs from this framework's monomial basis"
            )
        consumed.add("polylayer.powers")

    # Constant color matrices / coordinate buffers: compile-time constants
    # here; ignore (they carry no training state).
    for k in sd:
        if k.startswith(("rgb2lab.", "lab2rgb.", "rgb2hsv.", "hsv2rgb.")) or k in ("x", "y"):
            consumed.add(k)

    unexpected = sorted(set(sd) - consumed)
    if unexpected:
        builder.errors.append(f"unconsumed torch keys: {unexpected[:10]}{'...' if len(unexpected) > 10 else ''}")
    if builder.errors:
        raise ValueError("checkpoint conversion failed:\n  " + "\n  ".join(builder.errors))
    return {"params": builder.params, "batch_stats": builder.batch_stats}


def export_trispace_state_dict(variables: Mapping[str, Any], backbone_cfg: bb.BackboneCfg) -> dict[str, np.ndarray]:
    """Inverse mapping: curl_tpu variables -> a torch-style state_dict (used
    for round-trip testing and for exporting back to the reference)."""
    import flax

    params = flax.traverse_util.flatten_dict(variables["params"], sep="/")
    stats = flax.traverse_util.flatten_dict(variables.get("batch_stats", {}), sep="/")
    out: dict[str, np.ndarray] = {}

    def inv_conv(v):
        return np.asarray(v).transpose(3, 2, 0, 1)

    def put_conv(fk, tk):
        if fk + "/kernel" in params:
            out[tk + ".weight"] = inv_conv(params[fk + "/kernel"])

    def put_conv_bias(fk, tk):
        put_conv(fk, tk)
        if fk + "/bias" in params:
            out[tk + ".bias"] = np.asarray(params[fk + "/bias"])

    def put_bn(fk, tk):
        out[tk + ".weight"] = np.asarray(params[fk + "/scale"])
        out[tk + ".bias"] = np.asarray(params[fk + "/bias"])
        out[tk + ".running_mean"] = np.asarray(stats[fk + "/mean"])
        out[tk + ".running_var"] = np.asarray(stats[fk + "/var"])
        out[tk + ".num_batches_tracked"] = np.asarray(0)

    b = "backbone_net"
    put_conv(f"{b}/stem_conv", "backbone.conv_stem")
    put_bn(f"{b}/stem_bn", "backbone.bn1")
    for si, stage in enumerate(backbone_cfg.blocks):
        for bi in range(stage.repeats):
            f = f"{b}/stage{si}_block{bi}"
            t = f"backbone.blocks.{si}.{bi}"
            if stage.kind == "cn":
                put_conv(f + "/conv", t + ".conv")
                put_bn(f + "/bn", t + ".bn1")
            elif stage.kind == "er":
                put_conv(f + "/conv_exp", t + ".conv_exp")
                put_bn(f + "/bn1", t + ".bn1")
                put_conv(f + "/conv_pwl", t + ".conv_pwl")
                put_bn(f + "/bn2", t + ".bn2")
            else:
                put_conv(f + "/conv_pw", t + ".conv_pw")
                put_bn(f + "/bn1", t + ".bn1")
                put_conv(f + "/conv_dw", t + ".conv_dw")
                put_bn(f + "/bn2", t + ".bn2")
                if stage.se_ratio > 0:
                    put_conv_bias(f + "/se/reduce", t + ".se.conv_reduce")
                    put_conv_bias(f + "/se/expand", t + ".se.conv_expand")
                put_conv(f + "/conv_pwl", t + ".conv_pwl")
                put_bn(f + "/bn3", t + ".bn3")
    put_conv(f"{b}/head_conv", "backbone.conv_head")
    put_bn(f"{b}/head_bn", "backbone.bn2")
    i = 0
    while f"head/fc{i}/kernel" in params:
        out[f"backbone.classifier.{i}.weight"] = np.asarray(params[f"head/fc{i}/kernel"]).transpose(1, 0)
        out[f"backbone.classifier.{i}.bias"] = np.asarray(params[f"head/fc{i}/bias"])
        i += 1
    return out
