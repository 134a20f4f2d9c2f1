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
from typing import Any, Dict, Tuple

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
            # "norm." = the CLASSIFICATION head's final norm (timm); the
            # detection fork's per-stage out norms are "norm{i}." and ARE
            # mapped below (dropping them silently left imported
            # checkpoints with default out-norm scale/bias — found r4
            # while building the torch Swin twin)
            continue
        if m := re.fullmatch(r"norm(\d)\.(weight|bias)", k):
            put((f"norm{m.group(1)}",
                 "scale" if m.group(2) == "weight" else "bias"), v)
        elif k == "absolute_pos_embed":
            # detection-fork APE: (1, C, Hp, Wp) NCHW -> our (1, Hp, Wp, C)
            put(("absolute_pos_embed",), np.transpose(v, (0, 2, 3, 1)))
        elif k == "patch_embed.proj.weight":
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


def _restack_scanned_swin(mapped: dict, target: dict) -> dict:
    """Convert per-block ``stage{s}_block{b}`` imports to the nn.scan pair
    layout (swin.SwinTransformer ``scan_stages``): a ``stage{s}_blocks``
    tree with ``block0`` = even (W-MSA) / ``block1`` = odd (SW-MSA) blocks
    stacked along a leading (pairs,) axis. Stages whose target keeps
    per-block params (depth-2 stages stay unscanned) are left as-is."""
    for s in range(8):
        tgt_key = f"stage{s}_blocks"
        if tgt_key not in target:
            continue
        names = sorted((k for k in mapped
                        if re.fullmatch(rf"stage{s}_block\d+", k)),
                       key=lambda k: int(k.rsplit("block", 1)[1]))
        if not names:
            continue
        subs = [mapped.pop(k) for k in names]

        def stack(trees):
            if isinstance(trees[0], dict):
                return {k: stack([t[k] for t in trees]) for k in trees[0]}
            return np.stack(trees, axis=0)

        mapped[tgt_key] = {"block0": stack(subs[0::2]),
                           "block1": stack(subs[1::2])}
    return mapped


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


def _resize_rel_pos_table(v: np.ndarray, want_len: int) -> np.ndarray:
    """Bicubic-resize a flattened ``((2w-1)^2, nH)`` relative-position-bias
    table to a new window size — the microsoft Swin ``load_pretrained``
    convention (F.interpolate bicubic over the unflattened 2D table), so
    pretrained window-7 checkpoints load at the WINDOW_SIZE throughput knob
    (e.g. 8/10 tile 800px stages exactly; see docs/PERF.md)."""
    import torch
    import torch.nn.functional as F

    l0, nh = v.shape
    s0 = int(round(l0 ** 0.5))
    s1 = int(round(want_len ** 0.5))
    if s0 * s0 != l0 or s1 * s1 != want_len:
        raise ValueError(
            f"relative_position_bias_table lengths not square: "
            f"ckpt {l0} -> model {want_len}")
    t = torch.from_numpy(np.asarray(v, np.float32))
    t = t.reshape(s0, s0, nh).permute(2, 0, 1).unsqueeze(0)
    t = F.interpolate(t, size=(s1, s1), mode="bicubic", align_corners=False)
    return t.squeeze(0).permute(1, 2, 0).reshape(want_len, nh).numpy()


def _fit_rel_pos(v: np.ndarray, want_shape) -> np.ndarray:
    """Fit a (possibly pair-stacked ``(P, L, nH)``) bias table to the model
    shape by per-table bicubic interpolation (window-size change)."""
    if v.ndim == 2 and len(want_shape) == 2 and v.shape[1] == want_shape[1]:
        return _resize_rel_pos_table(v, int(want_shape[0]))
    if (v.ndim == 3 and len(want_shape) == 3
            and v.shape[0] == want_shape[0] and v.shape[2] == want_shape[2]):
        return np.stack([_resize_rel_pos_table(v[i], int(want_shape[1]))
                         for i in range(v.shape[0])], axis=0)
    raise ValueError(
        f"cannot fit relative_position_bias_table {v.shape} "
        f"to model shape {tuple(want_shape)}")


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
                    if k == "relative_position_bias_table":
                        v = _fit_rel_pos(np.asarray(v), cur.shape)
                    else:
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
            dst = plain[coll]["backbone"]
        elif coll in plain:
            dst = plain[coll]
        else:
            continue
        if is_swin and coll == "params":
            _restack_scanned_swin(converted[coll], dst)
        applied += _deep_update(dst, converted[coll])
    logger.info("imported %d arrays from %s (%s)", applied, path,
                "swin" if is_swin else "resnet")
    if applied == 0:
        raise ValueError(f"no weights matched from {path}")
    return plain


# ----------------------------------------------------------------- full model
#
# Complete detectron2-format MaskDINO / Mask2Former checkpoint import
# (reference loads full trained checkpoints at evaluate.py:113-115 via
# DetectionCheckpointer). Key layout follows the upstream IDEA-Research
# MaskDINO repo (maskdino/modeling/pixel_decoder/maskdino_encoder.py,
# .../transformer_decoder/maskdino_decoder.py + dino_decoder.py) and the
# facebookresearch Mask2Former repo, which the reference's external
# MASKDINO_PATH checkout provides (train_original.py:16-17).
#
# Orderings verified against the upstream forward pass:
# - pixel decoder srcs order is [extra-downsampled..., res5, res4, res3]
#   (maskdino_encoder.forward_features appends the stride-2 extras FIRST),
#   which equals our tf_feats order — level_embed rows and the
#   sampling_offsets/attention_weights level axes copy over verbatim.
# - The d2 ``input_proj`` ModuleList is indexed [res5, res4, res3,
#   ds0, ...] (build order), so module index n_tf+k maps to our
#   ``input_proj_ds{k}``.
# - The upstream decoder layer applies self-attn -> norm2, cross-attn ->
#   norm1, ffn -> norm3; ours is self-attn -> norm1, cross-attn -> norm2,
#   ffn -> norm3 (call order identical, names swapped).
# - Upstream shares one class head and one box MLP across decoder layers
#   AND the two-stage encoder output (class_embed, bbox_embed.{i} all
#   aliasing _bbox_embed); ours keeps separate enc_class_embed /
#   enc_box_embed modules, so the shared tensors are written to both.


def _conv1x1_dense(v: np.ndarray) -> np.ndarray:
    """d2 1x1 Conv2d weight (O, I, 1, 1) -> our Dense kernel (I, O)."""
    return np.transpose(v[:, :, 0, 0], (1, 0))


class _Mapper:
    """Accumulates (our-tree path -> array) writes + consumed d2 keys."""

    def __init__(self, state: Dict[str, np.ndarray]):
        self.state = state
        self.consumed: set = set()
        self.out: Dict[str, Any] = {}

    def has(self, key: str) -> bool:
        return key in self.state

    def take(self, key: str) -> np.ndarray:
        self.consumed.add(key)
        return self.state[key]

    def put(self, path, v: np.ndarray):
        node = self.out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = np.asarray(v, np.float32)

    def linear(self, d2key: str, path, transpose=True):
        if d2key + ".weight" in self.state:
            w = self.take(d2key + ".weight")
            self.put(path + ("kernel",), _dense(w) if transpose else w)
        if d2key + ".bias" in self.state:
            self.put(path + ("bias",), self.take(d2key + ".bias"))

    def norm(self, d2key: str, path):
        """LayerNorm/GroupNorm weight/bias -> scale/bias."""
        if d2key + ".weight" in self.state:
            self.put(path + ("scale",), self.take(d2key + ".weight"))
        if d2key + ".bias" in self.state:
            self.put(path + ("bias",), self.take(d2key + ".bias"))

    def conv(self, d2key: str, path, k1x1_dense=False):
        if d2key + ".weight" in self.state:
            w = self.take(d2key + ".weight")
            self.put(path + ("kernel",),
                     _conv1x1_dense(w) if k1x1_dense else _conv(w))
        if d2key + ".bias" in self.state:
            self.put(path + ("bias",), self.take(d2key + ".bias"))

    def mha(self, d2key: str, path):
        """torch nn.MultiheadAttention -> our q/k/v/out_proj Dense stack."""
        if d2key + ".in_proj_weight" in self.state:
            w = self.take(d2key + ".in_proj_weight")       # (3C, C)
            c = w.shape[1]
            for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                self.put(path + (name, "kernel"),
                         _dense(w[i * c:(i + 1) * c]))
        if d2key + ".in_proj_bias" in self.state:
            bvec = self.take(d2key + ".in_proj_bias")
            c = bvec.shape[0] // 3
            for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                self.put(path + (name, "bias"), bvec[i * c:(i + 1) * c])
        self.linear(d2key + ".out_proj", path + ("out_proj",))

    def mlp(self, d2key: str, path, n_layers=3):
        for j in range(n_layers):
            self.linear(f"{d2key}.layers.{j}", path + (f"layer{j}",))

    def deform_attn(self, d2key: str, path):
        for sub in ("sampling_offsets", "attention_weights", "value_proj",
                    "output_proj"):
            self.linear(f"{d2key}.{sub}", path + (sub,))


def _strip_prefix(state: Dict[str, np.ndarray], prefix: str
                  ) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in state.items()
            if k.startswith(prefix)}


def _map_pixel_decoder(state: Dict[str, np.ndarray]) -> _Mapper:
    """``sem_seg_head.pixel_decoder.*`` -> our pixel_decoder params."""
    m = _Mapper(state)
    # input projections: d2 list [res5, res4, res3, ds0, ...]
    n_proj = 1 + max([-1] + [int(r.group(1)) for k in state
                             if (r := re.match(r"input_proj\.(\d+)\.", k))])
    # count the transformer levels by conv kernel size (1x1 = backbone
    # lateral, 3x3 stride-2 = extra downsample)
    n_tf = sum(1 for i in range(n_proj)
               if state[f"input_proj.{i}.0.weight"].shape[-1] == 1)
    for i in range(n_proj):
        if i < n_tf:
            m.conv(f"input_proj.{i}.0", (f"input_proj{i}",), k1x1_dense=True)
            m.norm(f"input_proj.{i}.1", (f"input_proj{i}_norm",))
        else:
            k = i - n_tf
            m.conv(f"input_proj.{i}.0", (f"input_proj_ds{k}",))
            m.norm(f"input_proj.{i}.1", (f"input_proj_ds{k}_norm",))
    if "transformer.level_embed" in state:
        m.put(("level_embed",), m.take("transformer.level_embed"))
    li = 0
    while f"transformer.encoder.layers.{li}.norm1.weight" in state:
        base = f"transformer.encoder.layers.{li}"
        ours = f"encoder_layer{li}"
        m.deform_attn(f"{base}.self_attn", (ours, "self_attn"))
        m.norm(f"{base}.norm1", (ours, "norm1"))
        m.linear(f"{base}.linear1", (ours, "linear1"))
        m.linear(f"{base}.linear2", (ours, "linear2"))
        m.norm(f"{base}.norm2", (ours, "norm2"))
        li += 1
    # FPN laterals (the non-transformer scales; just res2 in this config):
    # d2 indexes them high-res-first within *_convs
    m.conv("lateral_convs.0", ("lateral_res2",), k1x1_dense=True)
    m.norm("lateral_convs.0.norm", ("lateral_res2_norm",))
    m.conv("output_convs.0", ("output_res2",))
    m.norm("output_convs.0.norm", ("output_res2_norm",))
    m.conv("mask_features", ("mask_features",), k1x1_dense=False)
    return m


def _map_maskdino_predictor(state: Dict[str, np.ndarray]) -> _Mapper:
    """``sem_seg_head.predictor.*`` (MaskDINO layout) -> our predictor."""
    m = _Mapper(state)
    # shared heads: upstream class_embed/_bbox_embed serve every decoder
    # layer and the two-stage encoder output
    m.linear("class_embed", ("class_embed",))
    m.linear("class_embed", ("enc_class_embed",))
    m.mlp("decoder.bbox_embed.0", ("box_embed",))
    m.mlp("decoder.bbox_embed.0", ("enc_box_embed",))
    # remaining bbox_embed.{i} are aliases of the same tensors — consume
    for k in list(state):
        if re.match(r"decoder\.bbox_embed\.\d+\.", k):
            m.consumed.add(k)
    m.mlp("mask_embed", ("mask_embed",))
    if "label_enc.weight" in state:
        m.put(("dn_label_enc",), m.take("label_enc.weight"))
    m.linear("enc_output", ("enc_output",))
    m.norm("enc_output_norm", ("enc_output_norm",))
    m.norm("decoder.norm", ("decoder_norm",))
    m.mlp("decoder.ref_point_head", ("ref_point_head",), n_layers=2)
    if "query_feat.weight" in state:
        m.put(("query_feat",), m.take("query_feat.weight"))
    if "refpoint_embed.weight" in state:
        m.put(("query_box",), m.take("refpoint_embed.weight"))
    li = 0
    while f"decoder.layers.{li}.norm1.weight" in state:
        base = f"decoder.layers.{li}"
        ours = f"layer{li}"
        m.deform_attn(f"{base}.cross_attn", (f"{ours}_cross_attn",))
        m.mha(f"{base}.self_attn", (f"{ours}_self_attn",))
        # upstream: self-attn -> norm2, cross-attn -> norm1, ffn -> norm3;
        # ours: self-attn -> norm1, cross-attn -> norm2, ffn -> norm3
        m.norm(f"{base}.norm2", (f"{ours}_norm1",))
        m.norm(f"{base}.norm1", (f"{ours}_norm2",))
        m.norm(f"{base}.norm3", (f"{ours}_norm3",))
        m.linear(f"{base}.linear1", (f"{ours}_ffn1",))
        m.linear(f"{base}.linear2", (f"{ours}_ffn2",))
        li += 1
    return m


def _map_mask2former_predictor(state: Dict[str, np.ndarray]) -> _Mapper:
    """``sem_seg_head.predictor.*`` (Mask2Former layout) -> our predictor."""
    m = _Mapper(state)
    for name in ("query_feat", "query_embed", "level_embed"):
        if f"{name}.weight" in state:
            m.put((name,), m.take(f"{name}.weight"))
    m.linear("class_embed", ("class_embed",))
    m.mlp("mask_embed", ("mask_embed",))
    m.norm("decoder_norm", ("decoder_norm",))
    # input_proj: upstream is an EMPTY Sequential when conv_dim == hidden
    # (no checkpoint keys) — identity-initialize ours so forwards agree
    i = 0
    while f"input_proj.{i}.weight" in state:
        m.conv(f"input_proj.{i}", (f"input_proj{i}",), k1x1_dense=True)
        i += 1
    li = 0
    while (f"transformer_self_attention_layers.{li}.norm.weight" in state):
        ours = f"layer{li}"
        m.mha(f"transformer_cross_attention_layers.{li}.multihead_attn",
              (f"{ours}_cross_attn",))
        m.norm(f"transformer_cross_attention_layers.{li}.norm",
               (f"{ours}_norm1",))
        m.mha(f"transformer_self_attention_layers.{li}.self_attn",
              (f"{ours}_self_attn",))
        m.norm(f"transformer_self_attention_layers.{li}.norm",
               (f"{ours}_norm2",))
        m.linear(f"transformer_ffn_layers.{li}.linear1", (f"{ours}_ffn1",))
        m.linear(f"transformer_ffn_layers.{li}.linear2", (f"{ours}_ffn2",))
        m.norm(f"transformer_ffn_layers.{li}.norm", (f"{ours}_norm3",))
        li += 1
    return m


def _identity_init_missing_input_proj(predictor_params: dict, mapped: dict):
    """Mask2Former's empty input_proj (conv_dim == hidden_dim) means our
    Dense input_proj{i} must be the identity for forward parity."""
    for k, v in predictor_params.items():
        if re.fullmatch(r"input_proj\d+", k) and k not in mapped:
            kern = np.asarray(v["kernel"])
            if kern.shape[0] == kern.shape[1]:
                mapped[k] = {"kernel": np.eye(kern.shape[0], dtype=np.float32),
                             "bias": np.zeros(kern.shape[1], np.float32)}


def _restack_scanned_encoder(mapped: dict, target: dict) -> dict:
    """Convert per-layer ``encoder_layer{i}`` imports to the nn.scan layout.

    With TPU.SCAN_ENC_LAYERS the deformable encoder params live under
    ``encoder_layers/layer/...`` with a leading (num_layers,) scan axis
    instead of per-layer ``encoder_layer{i}`` subtrees (pixel_decoder.py
    _DeformableEncoderScanBody); d2 checkpoints are per-layer, so stack
    the mapped subtrees along axis 0.
    """
    if "encoder_layers" not in target:
        return mapped
    names = sorted((k for k in mapped if re.match(r"encoder_layer\d+$", k)),
                   key=lambda k: int(k[len("encoder_layer"):]))
    if not names:
        return mapped
    subs = [mapped.pop(k) for k in names]

    def stack(trees):
        if isinstance(trees[0], dict):
            return {k: stack([t[k] for t in trees]) for k in trees[0]}
        return np.stack(trees, axis=0)

    mapped["encoder_layers"] = {"layer": stack(subs)}
    return mapped


def check_sampling_offset_halo(state: Dict[str, np.ndarray]) -> float:
    """Return (and warn about) the max |sampling offset bias| in sampled-
    level pixels vs the Pallas kernel's halo contract. The module clamps
    offsets to +-halo at runtime (deform_attn.MSDeformAttn.offset_clamp),
    so a checkpoint with wider biases runs clamped — flag it at load."""
    from vision_instance_seg_tpu.kernels.msdeform_attn import DEFAULT_HALO

    worst = 0.0
    for k, v in state.items():
        if k.endswith("sampling_offsets.bias"):
            worst = max(worst, float(np.abs(v).max()))
    if worst > DEFAULT_HALO:
        logger.warning(
            "checkpoint sampling-offset bias reaches %.1f px > halo %d: "
            "offsets will be clamped to the halo at runtime (exact kernel "
            "semantics, but not identical to the unclamped torch model)",
            worst, DEFAULT_HALO)
    return worst


def import_full_model_weights(path: str, variables: Any) -> Tuple[Any, Dict]:
    """Import a COMPLETE d2-format MaskDINO/Mask2Former checkpoint.

    Returns (updated variables, report) where report contains
    ``consumed`` / ``total`` d2-key counts, the ``unmapped`` d2 keys and
    the ``applied`` count of arrays written into the model tree.
    Reference capability: evaluate.py:113-115 loads full trained
    checkpoints, not just backbones.
    """
    import jax

    state = load_torch_state(path)
    plain = _to_mutable(jax.tree_util.tree_map(np.asarray,
                                               jax.device_get(variables)))
    params = plain.get("params", plain)

    consumed: set = set()
    applied = 0

    # backbone
    bb = _strip_prefix(state, "backbone.")
    if bb and "backbone" in params:
        is_swin = any(k.startswith("layers.0.blocks.") for k in bb)
        conv = _swin_key_map(bb) if is_swin else _resnet_key_map(bb)
        for coll in ("params", "frozen"):
            dst = plain.get(coll, {}).get("backbone") if coll in plain else None
            if dst is not None and conv.get(coll):
                if is_swin and coll == "params":
                    _restack_scanned_swin(conv[coll], dst)
                applied += _deep_update(dst, conv[coll])
        # every backbone.* key accounted (maps drop only heads/trackers)
        consumed |= {"backbone." + k for k in bb}

    # pixel decoder
    pd = _strip_prefix(state, "sem_seg_head.pixel_decoder.")
    if pd and "pixel_decoder" in params:
        mp = _map_pixel_decoder(pd)
        _restack_scanned_encoder(mp.out, params["pixel_decoder"])
        applied += _deep_update(params["pixel_decoder"], mp.out)
        consumed |= {"sem_seg_head.pixel_decoder." + k for k in mp.consumed}

    # predictor (MaskDINO vs Mask2Former layout auto-detected)
    pr = _strip_prefix(state, "sem_seg_head.predictor.")
    if pr and "predictor" in params:
        is_dino = any(k.startswith("decoder.layers.") for k in pr)
        mp = (_map_maskdino_predictor(pr) if is_dino
              else _map_mask2former_predictor(pr))
        if not is_dino:
            _identity_init_missing_input_proj(params["predictor"], mp.out)
        applied += _deep_update(params["predictor"], mp.out)
        consumed |= {"sem_seg_head.predictor." + k for k in mp.consumed}

    check_sampling_offset_halo(state)

    ignorable = re.compile(
        r"(criterion\.|pixel_mean|pixel_std|num_batches_tracked)")
    unmapped = sorted(k for k in state
                      if k not in consumed and not ignorable.search(k))
    report = {"consumed": len(consumed), "total": len(state),
              "applied": applied, "unmapped": unmapped}
    logger.info("full import from %s: %d/%d d2 keys consumed, %d arrays "
                "written, %d unmapped", path, len(consumed), len(state),
                applied, len(unmapped))
    if unmapped:
        logger.warning("unmapped checkpoint keys: %s",
                       ", ".join(unmapped[:20]))
    return plain, report


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
