"""Pretrained-weight import: torch/detectron2 checkpoints -> JAX pytrees.

The reference initializes its backbone from
``detectron2://ImageNetPretrained/torchvision/R-50.pkl``
(train_original.py:267) or a ``--pretrained-model`` torch checkpoint
(train_experiments.py:233-234). This module maps those formats onto the
flax parameter trees of models/resnet.py and models/swin.py:

- torch Conv (O, I, kh, kw)  -> flax kernel (kh, kw, I, O)
- torch Linear (O, I)        -> flax kernel (I, O)
- BatchNorm running stats    -> the 'frozen' collection of FrozenBatchNorm
- Swin: timm/microsoft key layout (layers.{s}.blocks.{b}.*) -> our
  stage{s}_block{b}.* names; relative position bias tables copied verbatim
  (same (2W-1)^2 x nH parameterization).

Numerics are verified in tests/test_weights.py by comparing layer outputs
against torch (CPU) on random inputs.
"""

from __future__ import annotations

import logging
import pickle
import re
from typing import Any, Dict

import numpy as np

logger = logging.getLogger(__name__)


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pt (torch) or .pkl (detectron2) checkpoint to numpy."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        state = data.get("model", data)
        return {k: np.asarray(v) for k, v in state.items()
                if isinstance(v, np.ndarray)}
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "state_dict", "module"):
        if isinstance(data, dict) and key in data:
            data = data[key]
    return {k: v.detach().numpy() for k, v in data.items()
            if hasattr(v, "detach")}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: dict, path, value, strict: bool = True) -> bool:
    node = tree
    for p in path[:-1]:
        if p not in node:
            if strict:
                raise KeyError(f"missing {'/'.join(path)}")
            return False
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        if strict:
            raise KeyError(f"missing {'/'.join(path)}")
        return False
    want = node[leaf].shape
    if tuple(value.shape) != tuple(want):
        raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                         f"ckpt {value.shape} vs model {want}")
    node[leaf] = value.astype(np.float32)
    return True


# --------------------------------------------------------------------- swin
def _swin_key_map(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """timm/microsoft Swin state_dict -> {params: ..., } nested dict pieces."""
    out: Dict[str, Any] = {"params": {}, "frozen": {}}
    p = out["params"]

    def put(path, v):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v

    for k, v in state.items():
        if k.startswith("head.") or k.endswith("attn_mask") \
                or "relative_position_index" in k or k.startswith("norm."):
            continue
        if k == "patch_embed.proj.weight":
            put(("patch_embed", "kernel"), _conv(v))
        elif k == "patch_embed.proj.bias":
            put(("patch_embed", "bias"), v)
        elif k == "patch_embed.norm.weight":
            put(("patch_norm", "scale"), v)
        elif k == "patch_embed.norm.bias":
            put(("patch_norm", "bias"), v)
        elif m := re.fullmatch(
                r"layers\.(\d+)\.blocks\.(\d+)\.(.+)", k):
            s, b, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            base = (f"stage{s}_block{b}",)
            if m2 := re.fullmatch(r"norm(\d)\.(weight|bias)", rest):
                put(base + (f"norm{m2.group(1)}",
                            "scale" if m2.group(2) == "weight" else "bias"), v)
            elif rest == "attn.relative_position_bias_table":
                put(base + ("attn", "relative_position_bias_table"), v)
            elif m2 := re.fullmatch(r"attn\.(qkv|proj)\.(weight|bias)", rest):
                leaf = "kernel" if m2.group(2) == "weight" else "bias"
                val = _dense(v) if leaf == "kernel" else v
                put(base + ("attn", m2.group(1), leaf), val)
            elif m2 := re.fullmatch(r"mlp\.fc(\d)\.(weight|bias)", rest):
                leaf = "kernel" if m2.group(2) == "weight" else "bias"
                val = _dense(v) if leaf == "kernel" else v
                put(base + ("mlp", f"fc{m2.group(1)}", leaf), val)
        elif m := re.fullmatch(
                r"layers\.(\d+)\.downsample\.(reduction|norm)\.(weight|bias)", k):
            s, mod, wb = int(m.group(1)), m.group(2), m.group(3)
            if mod == "reduction":
                put((f"downsample{s}", "reduction", "kernel"), _dense(v))
            else:
                put((f"downsample{s}", "norm",
                     "scale" if wb == "weight" else "bias"), v)
    return out


# ------------------------------------------------------------------- resnet
def _resnet_key_map(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision or detectron2 R-50 state -> nested params/frozen dicts."""
    params: Dict[str, Any] = {}
    frozen: Dict[str, Any] = {}

    def put(tree, path, v):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v

    def put_bn(prefix_params, name, stat, v):
        leaf = {"weight": "scale", "bias": "bias",
                "running_mean": "mean", "running_var": "var"}[stat]
        put(frozen, prefix_params + (name, leaf), v)

    # normalize detectron2 naming to torchvision-ish tokens first
    norm_state = {}
    for k, v in state.items():
        k = k.replace("backbone.bottom_up.", "")
        norm_state[k] = v

    for k, v in norm_state.items():
        if k.startswith("fc.") or "num_batches_tracked" in k:
            continue
        # --- stem
        if k in ("conv1.weight", "stem.conv1.weight"):
            put(params, ("stem_conv1", "kernel"), _conv(v))
        elif m := re.fullmatch(r"(?:bn1|stem\.conv1\.norm)\.(\w+)", k):
            put_bn((), "stem_norm", m.group(1), v)
        # --- torchvision: layer{L}.{B}.conv{i}.weight / bn{i}.* / downsample
        elif m := re.fullmatch(r"layer(\d)\.(\d+)\.conv(\d)\.weight", k):
            st, b, c = int(m.group(1)), int(m.group(2)), m.group(3)
            put(params, (f"res{st + 1}_block{b}", f"conv{c}", "kernel"), _conv(v))
        elif m := re.fullmatch(r"layer(\d)\.(\d+)\.bn(\d)\.(\w+)", k):
            st, b, c, stat = (int(m.group(1)), int(m.group(2)),
                              m.group(3), m.group(4))
            put_bn((f"res{st + 1}_block{b}",), f"conv{c}_norm", stat, v)
        elif m := re.fullmatch(r"layer(\d)\.(\d+)\.downsample\.0\.weight", k):
            st, b = int(m.group(1)), int(m.group(2))
            put(params, (f"res{st + 1}_block{b}", "shortcut", "kernel"), _conv(v))
        elif m := re.fullmatch(r"layer(\d)\.(\d+)\.downsample\.1\.(\w+)", k):
            st, b, stat = int(m.group(1)), int(m.group(2)), m.group(3)
            put_bn((f"res{st + 1}_block{b}",), "shortcut_norm", stat, v)
        # --- detectron2: res{R}.{B}.conv{i}.{weight|norm.*} / shortcut
        elif m := re.fullmatch(r"res(\d)\.(\d+)\.conv(\d)\.weight", k):
            r_, b, c = int(m.group(1)), int(m.group(2)), m.group(3)
            put(params, (f"res{r_}_block{b}", f"conv{c}", "kernel"), _conv(v))
        elif m := re.fullmatch(r"res(\d)\.(\d+)\.conv(\d)\.norm\.(\w+)", k):
            r_, b, c, stat = (int(m.group(1)), int(m.group(2)),
                              m.group(3), m.group(4))
            put_bn((f"res{r_}_block{b}",), f"conv{c}_norm", stat, v)
        elif m := re.fullmatch(r"res(\d)\.(\d+)\.shortcut\.weight", k):
            r_, b = int(m.group(1)), int(m.group(2))
            put(params, (f"res{r_}_block{b}", "shortcut", "kernel"), _conv(v))
        elif m := re.fullmatch(r"res(\d)\.(\d+)\.shortcut\.norm\.(\w+)", k):
            r_, b, stat = int(m.group(1)), int(m.group(2)), m.group(3)
            put_bn((f"res{r_}_block{b}",), "shortcut_norm", stat, v)
    return {"params": params, "frozen": frozen}


def _deep_update(dst: dict, src: dict, path="") -> int:
    n = 0
    for k, v in src.items():
        if isinstance(v, dict):
            if k in dst and isinstance(dst[k], dict):
                n += _deep_update(dst[k], v, path + "/" + str(k))
        else:
            if k in dst:
                cur = np.asarray(dst[k])
                if tuple(cur.shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: ckpt {v.shape} "
                        f"vs model {cur.shape}")
                dst[k] = np.asarray(v, np.float32)
                n += 1
    return n


def import_backbone_weights(path: str, variables: Any) -> Any:
    """Load torch/detectron2 backbone weights into a model variables tree.

    ``variables`` may be the full model tree (backbone under
    params/backbone) or a bare backbone tree. Returns the updated tree.
    """
    import jax

    state = load_torch_state(path)
    is_swin = any(k.startswith("layers.0.blocks.") for k in state)
    converted = _swin_key_map(state) if is_swin else _resnet_key_map(state)

    plain = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    plain = _to_mutable(plain)

    applied = 0
    for coll in ("params", "frozen"):
        if coll not in converted or not converted[coll]:
            continue
        if coll in plain and "backbone" in plain[coll]:
            applied += _deep_update(plain[coll]["backbone"], converted[coll])
        elif coll in plain:
            applied += _deep_update(plain[coll], converted[coll])
    logger.info("imported %d arrays from %s (%s)", applied, path,
                "swin" if is_swin else "resnet")
    if applied == 0:
        raise ValueError(f"no weights matched from {path}")
    return plain


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    try:  # FrozenDict
        from flax.core import FrozenDict
        if isinstance(tree, FrozenDict):
            return {k: _to_mutable(v) for k, v in tree.items()}
    except ImportError:
        pass
    return tree
