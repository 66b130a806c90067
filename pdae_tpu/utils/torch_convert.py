"""Torch -> JAX checkpoint conversion for the reference's model families.

The reference distributes pre-trained DPMs and trained PDAE stages as torch
``.pt`` files (``/root/reference/README.md:45-51``).  This module maps their
state-dict keys onto our flax param trees so those downloads load directly
into pdae_tpu:

  torch                         flax (ours)
  ------------------------------------------------------------------
  time_embed.0 / .2             time_embed/dense_0 / dense_1
  label_emb (Embedding)         label_emb/embedding
  label_emb (Linear, ShiftUNet) label_emb/{kernel,bias}
  input_blocks.I.J.*            input_blocks_I_J/*
  middle_block.J.*              middle_block_J/*
  output_blocks.I.J.*           output_blocks_I_J/*
  shift_middle_block.J.*        shift_middle_block_J/*
  shift_output_blocks.I.J.*     shift_output_blocks_I_J/*
  out.0 / out.2                 out_norm / out_conv
  shift_out.0 / shift_out.2     shift_out_norm / shift_out_conv
  ResBlock: in_layers.0/.2, emb_layers.1, emb_z_layers.1, out_layers.0/.3,
            skip_connection  ->  in_norm, in_conv, emb_dense, emb_z_dense,
            out_norm, out_conv, skip_conv
  Attention: norm, qkv, proj_out (conv1d) -> norm, qkv, proj_out (Dense)

Weight layout: conv [O,I,kh,kw] -> HWIO; linear [O,I] -> [I,O];
conv1d [O,I,1] -> [I,O]; GroupNorm/LayerNorm weight/bias -> scale/bias.

Layout is NCHW->NHWC at the activation level, which conv kernel transposes
fully absorb; numerical parity is validated in tests/test_torch_convert.py
by comparing forward outputs of the torch reference vs converted flax.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _set(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(value)


def _conv_kernel(w):
    w = np.asarray(w)
    if w.ndim == 4:          # [O,I,kh,kw] -> [kh,kw,I,O]
        return w.transpose(2, 3, 1, 0)
    if w.ndim == 3:          # conv1d [O,I,1] -> [I,O]
        return w[:, :, 0].T
    raise ValueError(w.shape)


def _linear_kernel(w):
    return np.asarray(w).T


_RES_MAP = {
    "in_layers.0": ("in_norm", "norm"),
    "in_layers.2": ("in_conv", "conv"),
    "emb_layers.1": ("emb_dense", "linear"),
    "emb_z_layers.1": ("emb_z_dense", "linear"),
    "out_layers.0": ("out_norm", "norm"),
    "out_layers.3": ("out_conv", "conv"),
    "skip_connection": ("skip_conv", "conv"),
    "norm": ("norm", "norm"),
    "qkv": ("qkv", "conv"),
    "proj_out": ("proj_out", "conv"),
}


def _convert_leaf(kind: str, pname: str, value):
    if kind == "norm":
        return ("scale" if pname == "weight" else "bias"), np.asarray(value)
    if kind == "conv":
        if pname == "weight":
            return "kernel", _conv_kernel(value)
        return "bias", np.asarray(value)
    if kind == "linear":
        if pname == "weight":
            return "kernel", _linear_kernel(value)
        return "bias", np.asarray(value)
    raise ValueError(kind)


_BLOCK_RE = re.compile(
    r"^(input_blocks|output_blocks|shift_output_blocks)\.(\d+)\.(\d+)\.(.+)$")
_MID_RE = re.compile(r"^(middle_block|shift_middle_block)\.(\d+)\.(.+)$")


def convert_unet_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Torch UNet/ShiftUNet state dict -> flax param dict."""
    tree: Dict = {}
    has_label_bias = "label_emb.bias" in sd
    for key, value in sd.items():
        value = np.asarray(value)
        if key.startswith("time_embed."):
            idx, pname = key.split(".")[1:]
            dense = {"0": "dense_0", "2": "dense_1"}[idx]
            leaf, v = _convert_leaf("linear", pname, value)
            _set(tree, ("time_embed", dense, leaf), v)
            continue
        if key.startswith("label_emb."):
            pname = key.split(".")[1]
            if has_label_bias:  # Linear (ShiftUNet latent embedding)
                leaf, v = _convert_leaf("linear", pname, value)
                _set(tree, ("label_emb", leaf), v)
            else:               # Embedding (class-conditional UNet)
                _set(tree, ("label_emb", "embedding"), value)
            continue
        m = _BLOCK_RE.match(key)
        if m:
            group, i, j, rest = m.groups()
            mod = f"{group}_{i}_{j}"
            # input_blocks.0.0 is the stem conv (no ResBlock inside)
            if group == "input_blocks" and i == "0" and j == "0":
                leaf, v = _convert_leaf("conv", rest, value)
                _set(tree, (mod, leaf), v)
                continue
            sub, pname = rest.rsplit(".", 1)
            name, kind = _RES_MAP[sub]
            leaf, v = _convert_leaf(kind, pname, value)
            _set(tree, (mod, name, leaf), v)
            continue
        m = _MID_RE.match(key)
        if m:
            group, j, rest = m.groups()
            mod = f"{group}_{j}"
            sub, pname = rest.rsplit(".", 1)
            name, kind = _RES_MAP[sub]
            leaf, v = _convert_leaf(kind, pname, value)
            _set(tree, (mod, name, leaf), v)
            continue
        for torch_prefix, norm_name, conv_name in (
                ("out.", "out_norm", "out_conv"),
                ("shift_out.", "shift_out_norm", "shift_out_conv")):
            if key.startswith(torch_prefix):
                idx, pname = key[len(torch_prefix):].split(".")
                if idx == "0":
                    leaf, v = _convert_leaf("norm", pname, value)
                    _set(tree, (norm_name, leaf), v)
                else:
                    leaf, v = _convert_leaf("conv", pname, value)
                    _set(tree, (conv_name, leaf), v)
                break
        else:
            raise KeyError(f"unmapped torch key: {key}")
    return tree


# encoder Sequential index -> (our name, kind) per geometry
_ENCODER_MAPS = {
    4: {  # 64px: channels (64,128,128,128), attn after stage 2
        "0": ("conv_0", "conv"), "1": ("norm_1", "norm"),
        "3": ("conv_1", "conv"), "4": ("attn_1", "attn"),
        "5": ("norm_2", "norm"), "7": ("conv_2", "conv"),
        "8": ("norm_3", "norm"), "10": ("conv_3", "conv"),
        "11": ("final_norm", "norm"), "14": ("final_dense", "linear"),
    },
    5: {  # 128px: channels (64,128,256,256,256), attn after stage 3
        "0": ("conv_0", "conv"), "1": ("norm_1", "norm"),
        "3": ("conv_1", "conv"), "4": ("norm_2", "norm"),
        "6": ("conv_2", "conv"), "7": ("attn_2", "attn"),
        "8": ("norm_3", "norm"), "10": ("conv_3", "conv"),
        "11": ("norm_4", "norm"), "13": ("conv_4", "conv"),
        "14": ("final_norm", "norm"), "17": ("final_dense", "linear"),
    },
}


def convert_encoder_state_dict(sd: Dict[str, np.ndarray],
                               num_stages: int) -> Dict:
    """Torch SemanticEncoder (nn.Sequential) -> flax param dict.
    ``num_stages``: 4 for 64px, 5 for 128px geometry."""
    mapping = _ENCODER_MAPS[num_stages]
    final_ch = 128 if num_stages == 4 else 256
    tree: Dict = {}
    for key, value in sd.items():
        assert key.startswith("encoder."), key
        idx, rest = key[len("encoder."):].split(".", 1)
        name, kind = mapping[idx]
        if kind == "attn":
            sub, pname = rest.rsplit(".", 1)
            sub_name, sub_kind = _RES_MAP[sub]
            leaf, v = _convert_leaf(sub_kind, pname, value)
            _set(tree, (name, sub_name, leaf), v)
        elif name == "final_dense" and rest == "weight":
            # torch flattens CHW-major, our NHWC flatten is HWC-major:
            # permute the input dim [out, C*H*W] -> [H*W*C, out]
            w = np.asarray(value)
            out_dim = w.shape[0]
            w = w.reshape(out_dim, final_ch, 4, 4).transpose(0, 2, 3, 1)
            _set(tree, (name, "kernel"), w.reshape(out_dim, -1).T)
        else:
            leaf, v = _convert_leaf(kind, rest, value)
            _set(tree, (name, leaf), v)
    return tree


def convert_mlp_skip_net_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Torch MLPSkipNet -> flax param dict."""
    tree: Dict = {}
    for key, value in sd.items():
        parts = key.split(".")
        if parts[0] == "time_embed":
            dense = {"0": "time_embed_0", "2": "time_embed_1"}[parts[1]]
            leaf, v = _convert_leaf("linear", parts[2], value)
            _set(tree, (dense, leaf), v)
        elif parts[0] == "layers":
            i = parts[1]
            sub = parts[2]           # linear | linear_emb | norm
            pname = parts[-1]
            kind = "norm" if sub == "norm" else "linear"
            # torch registers linear_emb both directly and inside
            # cond_layers (same tensor); keep the direct one
            if sub == "cond_layers":
                continue
            leaf, v = _convert_leaf(kind, pname, value)
            _set(tree, (f"layers_{i}", sub, leaf), v)
        else:
            raise KeyError(f"unmapped torch key: {key}")
    return tree


def convert_classifier_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Torch nn.Linear classifier -> flax {fc: {kernel,bias}}."""
    tree: Dict = {}
    for key, value in sd.items():
        pname = key.split(".")[-1]
        leaf, v = _convert_leaf("linear", pname, value)
        _set(tree, ("fc", leaf), v)
    return tree


def convert_reference_checkpoint(data: Dict, num_encoder_stages: int = 4) -> Dict:
    """Convert a full reference trainer checkpoint dict (torch tensors) to
    our msgpack-ready dict, key-for-key.  Optimizer/scaler states are not
    portable and are skipped."""
    out: Dict = {}
    for key, value in data.items():
        if key == "step":
            out["step"] = np.asarray(int(value), np.int32)
        elif key in ("denoise_fn", "ema_denoise_fn", "decoder", "ema_decoder"):
            out[key] = convert_unet_state_dict(_numpy_sd(value))
        elif key in ("encoder", "ema_encoder"):
            out[key] = convert_encoder_state_dict(_numpy_sd(value),
                                                  num_encoder_stages)
        elif key in ("latent_denoise_fn", "ema_latent_denoise_fn"):
            out[key] = convert_mlp_skip_net_state_dict(_numpy_sd(value))
        elif key in ("classifier", "ema_classifier"):
            out[key] = convert_classifier_state_dict(_numpy_sd(value))
        elif key in ("mean", "std"):
            out[key] = np.asarray(value, np.float32)
        # optimizer / scaler: silently skipped (not portable)
    return out


_LPIPS_CONV_IDX = {"0": 0, "3": 1, "6": 2, "8": 3, "10": 4}


def convert_lpips_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Torch ``lpips`` package (AlexNet) state dict -> our flat param dict
    (see pdae_tpu/metrics/lpips.py).  Accepts both the lpips wrapper keys
    (``net.sliceK.<idx>.weight`` + ``linK.model.1.weight``) and a raw
    torchvision alexnet ``features.<idx>.*`` dict."""
    out: Dict = {}
    for key, value in sd.items():
        v = np.asarray(value)
        if key.startswith("scaling_layer."):
            continue  # we hardcode the standard shift/scale buffers
        if ".model.1.weight" in key and key.startswith("lin"):
            i = int(key[len("lin"):].split(".")[0])
            out[f"lin{i}_w"] = v.reshape(-1)          # [1,C,1,1] -> [C]
            continue
        idx = None
        if key.startswith("net.slice"):
            idx = key.split(".")[2]
        elif key.startswith("features."):
            idx = key.split(".")[1]
        if idx is not None and idx in _LPIPS_CONV_IDX:
            i = _LPIPS_CONV_IDX[idx]
            if key.endswith(".weight"):
                out[f"conv{i}_w"] = v.transpose(2, 3, 1, 0)
            else:
                out[f"conv{i}_b"] = v
            continue
        # anything else (relu/pool placeholders) has no params
    return out


def _numpy_sd(sd) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v) for k, v in sd.items()}


# --------------------------------------------------------------------------- #
# Reverse direction: OUR checkpoints -> reference torch state dicts, so a
# model trained here can be loaded by the reference code (two-way migration;
# layouts are the exact inverses of the forward maps above).
# --------------------------------------------------------------------------- #

_EXPORT_RES_MAP = {
    "in_norm": ("in_layers.0", "norm"),
    "in_conv": ("in_layers.2", "conv2d"),
    "emb_dense": ("emb_layers.1", "linear"),
    "emb_z_dense": ("emb_z_layers.1", "linear"),
    "out_norm": ("out_layers.0", "norm"),
    "out_conv": ("out_layers.3", "conv2d"),
    "skip_conv": ("skip_connection", "conv2d"),
    "norm": ("norm", "norm"),
    "qkv": ("qkv", "conv1d"),
    "proj_out": ("proj_out", "conv1d"),
}

_EXPORT_BLOCK_RE = re.compile(
    r"^(input_blocks|output_blocks|shift_output_blocks)_(\d+)_(\d+)$")
_EXPORT_MID_RE = re.compile(r"^(middle_block|shift_middle_block)_(\d+)$")


def _export_leaf(kind: str, leaf: str, value):
    v = np.asarray(value)
    if kind == "norm":
        return ("weight" if leaf == "scale" else "bias"), v
    if leaf == "bias":
        return "bias", v
    assert leaf == "kernel", leaf
    if kind == "conv2d":       # [kh,kw,I,O] -> [O,I,kh,kw]
        return "weight", v.transpose(3, 2, 0, 1)
    if kind == "conv1d":       # [I,O] -> [O,I,1]
        return "weight", v.T[:, :, None]
    if kind == "linear":       # [I,O] -> [O,I]
        return "weight", v.T
    raise ValueError(kind)


def _export_sub(sd, prefix: str, subtree: Dict):
    for name, leaves in subtree.items():
        torch_sub, kind = _EXPORT_RES_MAP[name]
        for leaf, value in leaves.items():
            pname, v = _export_leaf(kind, leaf, value)
            sd[f"{prefix}.{torch_sub}.{pname}"] = v


def export_unet_state_dict(tree: Dict) -> Dict[str, np.ndarray]:
    """Flax UNet/ShiftUNet param dict -> torch state dict
    (inverse of :func:`convert_unet_state_dict`)."""
    sd: Dict[str, np.ndarray] = {}
    for mod, sub in tree.items():
        if mod == "time_embed":
            for dense, idx in (("dense_0", "0"), ("dense_1", "2")):
                for leaf, value in sub[dense].items():
                    pname, v = _export_leaf("linear", leaf, value)
                    sd[f"time_embed.{idx}.{pname}"] = v
        elif mod == "label_emb":
            if "embedding" in sub:   # class-conditional Embedding
                sd["label_emb.weight"] = np.asarray(sub["embedding"])
            else:                    # ShiftUNet latent Linear
                for leaf, value in sub.items():
                    pname, v = _export_leaf("linear", leaf, value)
                    sd[f"label_emb.{pname}"] = v
        elif mod == "input_blocks_0_0":   # stem conv
            for leaf, value in sub.items():
                pname, v = _export_leaf("conv2d", leaf, value)
                sd[f"input_blocks.0.0.{pname}"] = v
        elif _EXPORT_BLOCK_RE.match(mod):
            group, i, j = _EXPORT_BLOCK_RE.match(mod).groups()
            _export_sub(sd, f"{group}.{i}.{j}", sub)
        elif _EXPORT_MID_RE.match(mod):
            group, j = _EXPORT_MID_RE.match(mod).groups()
            _export_sub(sd, f"{group}.{j}", sub)
        elif mod in ("out_norm", "out_conv", "shift_out_norm",
                     "shift_out_conv"):
            prefix = "shift_out" if mod.startswith("shift_") else "out"
            kind = "norm" if mod.endswith("norm") else "conv2d"
            idx = "0" if mod.endswith("norm") else "2"
            for leaf, value in sub.items():
                pname, v = _export_leaf(kind, leaf, value)
                sd[f"{prefix}.{idx}.{pname}"] = v
        else:
            raise KeyError(f"unmapped flax module: {mod}")
    return sd


def export_encoder_state_dict(tree: Dict, num_stages: int) -> Dict:
    """Flax SemanticEncoder -> torch nn.Sequential state dict
    (inverse of :func:`convert_encoder_state_dict`)."""
    mapping = {name: (idx, kind)
               for idx, (name, kind) in _ENCODER_MAPS[num_stages].items()}
    final_ch = 128 if num_stages == 4 else 256
    sd: Dict[str, np.ndarray] = {}
    for name, sub in tree.items():
        idx, kind = mapping[name]
        if kind == "attn":
            inner: Dict[str, np.ndarray] = {}
            _export_sub(inner, "a", sub)   # reuse; strip the placeholder
            for k, v in inner.items():
                sd[f"encoder.{idx}.{k[2:]}"] = v
        elif name == "final_dense":
            w = np.asarray(sub["kernel"]).T          # [out, H*W*C]
            out_dim = w.shape[0]
            w = w.reshape(out_dim, 4, 4, final_ch).transpose(0, 3, 1, 2)
            sd[f"encoder.{idx}.weight"] = w.reshape(out_dim, -1)
            sd[f"encoder.{idx}.bias"] = np.asarray(sub["bias"])
        else:
            kk = {"conv": "conv2d", "norm": "norm"}[kind]
            for leaf, value in sub.items():
                pname, v = _export_leaf(kk, leaf, value)
                sd[f"encoder.{idx}.{pname}"] = v
    return sd


def export_mlp_skip_net_state_dict(tree: Dict) -> Dict:
    """Flax MLPSkipNet -> torch state dict (inverse of
    :func:`convert_mlp_skip_net_state_dict`).  The reference registers the
    per-layer ``linear_emb`` tensors twice (also under ``cond_layers.1``);
    both keys are emitted so ``load_state_dict(strict=True)`` works."""
    sd: Dict[str, np.ndarray] = {}
    for mod, sub in tree.items():
        if mod in ("time_embed_0", "time_embed_1"):
            idx = {"time_embed_0": "0", "time_embed_1": "2"}[mod]
            for leaf, value in sub.items():
                pname, v = _export_leaf("linear", leaf, value)
                sd[f"time_embed.{idx}.{pname}"] = v
        elif mod.startswith("layers_"):
            i = mod[len("layers_"):]
            for sub_name, leaves in sub.items():
                kind = "norm" if sub_name == "norm" else "linear"
                for leaf, value in leaves.items():
                    pname, v = _export_leaf(kind, leaf, value)
                    sd[f"layers.{i}.{sub_name}.{pname}"] = v
                    if sub_name == "linear_emb":
                        sd[f"layers.{i}.cond_layers.1.{pname}"] = v
        else:
            raise KeyError(f"unmapped flax module: {mod}")
    return sd


def export_classifier_state_dict(tree: Dict) -> Dict:
    sd: Dict[str, np.ndarray] = {}
    for leaf, value in tree["fc"].items():
        pname, v = _export_leaf("linear", leaf, value)
        sd[pname] = v
    return sd


def export_reference_checkpoint(data: Dict,
                                num_encoder_stages: int = 4) -> Dict:
    """Our msgpack checkpoint dict -> a reference-trainer-shaped dict of
    torch-loadable state dicts, key-for-key (inverse of
    :func:`convert_reference_checkpoint`)."""
    out: Dict = {}
    for key, value in data.items():
        if key == "step":
            out["step"] = int(np.asarray(value))
        elif key in ("denoise_fn", "ema_denoise_fn", "decoder",
                     "ema_decoder"):
            out[key] = export_unet_state_dict(value)
        elif key in ("encoder", "ema_encoder"):
            out[key] = export_encoder_state_dict(value, num_encoder_stages)
        elif key in ("latent_denoise_fn", "ema_latent_denoise_fn"):
            out[key] = export_mlp_skip_net_state_dict(value)
        elif key in ("classifier", "ema_classifier"):
            out[key] = export_classifier_state_dict(value)
        elif key in ("mean", "std"):
            out[key] = np.asarray(value, np.float32)
        # optimizer state: not portable, skipped
    return out
