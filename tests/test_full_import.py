"""Full-model detectron2-checkpoint import (utils/weights.py).

The reference's eval surface loads COMPLETE trained MaskDINO checkpoints
(reference training/maskdino/evaluate.py:113-115 via DetectionCheckpointer),
not just backbones. These tests synthesize reference-shaped torch state
dicts whose KEY NAMES are hand-written here from the upstream
IDEA-Research MaskDINO / facebookresearch Mask2Former module layouts
(independent of the importer's tables, so a naming drift in either shows
up as unmapped keys / missed arrays), import them, and check

- 100% key coverage (no unmapped keys, every emitted key consumed),
- tensors land transposed into the right leaves,
- per-module numerics: our flax modules loaded with the imported params
  match the equivalent torch modules (Linear / LayerNorm /
  nn.MultiheadAttention) on random inputs at fp32.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vision_instance_seg_tpu.config import get_cfg  # noqa: E402
from vision_instance_seg_tpu.models import build_model, normalize_image  # noqa: E402
from vision_instance_seg_tpu.utils.weights import (  # noqa: E402
    check_sampling_offset_halo, import_full_model_weights)

C = 32          # hidden dim
NH = 4          # heads
FFN = 64
ENC_FFN = 1024  # pixel-decoder encoder FFN is fixed (reference yaml value)
DEC = 3         # cfg DEC_LAYERS (model runs DEC-1 = 2 layers)
ENC = 2         # encoder layers
NCLS = 1
NQ = 8
LEVELS = 4      # 3 backbone scales + 1 extra downsample (the 4s config)


def _tiny_cfg(dino: bool):
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "resnet"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.MASK_DINO.ENABLED = dino
    cfg.MODEL.MASK_DINO.CROSS_ATTENTION = "deformable"
    cfg.MODEL.MASK_DINO.TWO_STAGE = True
    cfg.MODEL.SEM_SEG_HEAD.ENCODER_ATTENTION = "deformable"
    cfg.MODEL.SEM_SEG_HEAD.TOTAL_NUM_FEATURE_LEVELS = LEVELS if dino else 3
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = C
    cfg.MODEL.SEM_SEG_HEAD.MASK_DIM = C
    cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = ENC
    cfg.MODEL.SEM_SEG_HEAD.DEFORM_NUM_HEADS = NH
    cfg.MODEL.MASK_FORMER.HIDDEN_DIM = C
    cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES = NQ
    cfg.MODEL.MASK_FORMER.DIM_FEEDFORWARD = FFN
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = DEC
    cfg.MODEL.MASK_FORMER.NHEADS = NH
    cfg.INPUT.MAX_INSTANCES = 4
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.USE_PALLAS_WINDOW_ATTN = False
    cfg.TPU.USE_PALLAS_DEFORM_ATTN = False
    return cfg


def _init_variables(cfg):
    model = build_model(cfg)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    normalize_image(imgs, cfg))
    return model, variables


def _t(rng, *shape):
    return torch.from_numpy(
        rng.standard_normal(shape).astype(np.float32) * 0.1)


def _linear(sd, rng, key, o, i):
    sd[f"{key}.weight"] = _t(rng, o, i)
    sd[f"{key}.bias"] = _t(rng, o)


def _norm(sd, rng, key, c):
    sd[f"{key}.weight"] = _t(rng, c)
    sd[f"{key}.bias"] = _t(rng, c)


def _mlp(sd, rng, key, i, h, o, n=3):
    dims = [i] + [h] * (n - 1) + [o]
    for j in range(n):
        _linear(sd, rng, f"{key}.layers.{j}", dims[j + 1], dims[j])


def _mha(sd, rng, key, c):
    sd[f"{key}.in_proj_weight"] = _t(rng, 3 * c, c)
    sd[f"{key}.in_proj_bias"] = _t(rng, 3 * c)
    _linear(sd, rng, f"{key}.out_proj", c, c)


def _deform(sd, rng, key, c, nl):
    _linear(sd, rng, f"{key}.sampling_offsets", NH * nl * 4 * 2, c)
    _linear(sd, rng, f"{key}.attention_weights", NH * nl * 4, c)
    _linear(sd, rng, f"{key}.value_proj", c, c)
    _linear(sd, rng, f"{key}.output_proj", c, c)


def _synth_pixel_decoder(sd, rng, levels):
    """maskdino/modeling/pixel_decoder/maskdino_encoder.py layout.

    input_proj ModuleList order: [res5, res4, res3, ds...] — 1x1 convs off
    the backbone channels then 3x3-stride-2 extras; Sequential(conv, GN).
    """
    p = "sem_seg_head.pixel_decoder"
    bb_ch = [2048, 1024, 512]                   # res5, res4, res3
    for i, ch in enumerate(bb_ch):
        sd[f"{p}.input_proj.{i}.0.weight"] = _t(rng, C, ch, 1, 1)
        sd[f"{p}.input_proj.{i}.0.bias"] = _t(rng, C)
        _norm(sd, rng, f"{p}.input_proj.{i}.1", C)
    for k in range(levels - 3):
        i = 3 + k
        ch = 2048 if k == 0 else C
        sd[f"{p}.input_proj.{i}.0.weight"] = _t(rng, C, ch, 3, 3)
        sd[f"{p}.input_proj.{i}.0.bias"] = _t(rng, C)
        _norm(sd, rng, f"{p}.input_proj.{i}.1", C)
    sd[f"{p}.transformer.level_embed"] = _t(rng, levels, C)
    for li in range(ENC):
        base = f"{p}.transformer.encoder.layers.{li}"
        _deform(sd, rng, f"{base}.self_attn", C, levels)
        _norm(sd, rng, f"{base}.norm1", C)
        _linear(sd, rng, f"{base}.linear1", ENC_FFN, C)
        _linear(sd, rng, f"{base}.linear2", C, ENC_FFN)
        _norm(sd, rng, f"{base}.norm2", C)
    # FPN on the non-transformer scale (res2): lateral 1x1 (no bias, GN),
    # output 3x3 (no bias, GN)
    sd[f"{p}.lateral_convs.0.weight"] = _t(rng, C, 256, 1, 1)
    _norm(sd, rng, f"{p}.lateral_convs.0.norm", C)
    sd[f"{p}.output_convs.0.weight"] = _t(rng, C, C, 3, 3)
    _norm(sd, rng, f"{p}.output_convs.0.norm", C)
    sd[f"{p}.mask_features.weight"] = _t(rng, C, C, 1, 1)
    sd[f"{p}.mask_features.bias"] = _t(rng, C)


def _synth_maskdino_predictor(sd, rng):
    """maskdino/modeling/transformer_decoder/{maskdino_decoder,dino_decoder}
    layout: shared class_embed/label_enc/mask_embed/_bbox_embed (bbox_embed
    ModuleList aliases the same MLP per layer), two-stage enc_output(+norm),
    decoder.{norm, ref_point_head, layers.i.{cross_attn, self_attn, norm1-3,
    linear1-2}}."""
    p = "sem_seg_head.predictor"
    _linear(sd, rng, f"{p}.class_embed", NCLS, C)
    sd[f"{p}.label_enc.weight"] = _t(rng, NCLS + 1, C)
    _mlp(sd, rng, f"{p}.mask_embed", C, C, C)
    _linear(sd, rng, f"{p}.enc_output", C, C)
    _norm(sd, rng, f"{p}.enc_output_norm", C)
    _norm(sd, rng, f"{p}.decoder.norm", C)
    _mlp(sd, rng, f"{p}.decoder.ref_point_head", 2 * C, C, C, n=2)
    # shared box MLP, aliased per layer (deepcopy-free ModuleList upstream)
    box = {}
    _mlp(box, rng, "x", C, C, 4)
    for i in range(DEC - 1):
        for k, v in box.items():
            sd[f"{p}.decoder.bbox_embed.{i}." + k.split("x.", 1)[1]] = v
    for li in range(DEC - 1):
        base = f"{p}.decoder.layers.{li}"
        _deform(sd, rng, f"{base}.cross_attn", C, LEVELS)
        _mha(sd, rng, f"{base}.self_attn", C)
        _norm(sd, rng, f"{base}.norm1", C)
        _norm(sd, rng, f"{base}.norm2", C)
        _norm(sd, rng, f"{base}.norm3", C)
        _linear(sd, rng, f"{base}.linear1", FFN, C)
        _linear(sd, rng, f"{base}.linear2", C, FFN)


def _synth_mask2former_predictor(sd, rng):
    """mask2former/modeling/transformer_decoder/mask2former_transformer_decoder.py
    layout. input_proj entries are EMPTY Sequentials at conv_dim ==
    hidden_dim (no keys emitted — the importer must identity-init ours)."""
    p = "sem_seg_head.predictor"
    for name in ("query_feat", "query_embed"):
        sd[f"{p}.{name}.weight"] = _t(rng, NQ, C)
    sd[f"{p}.level_embed.weight"] = _t(rng, 3, C)
    _linear(sd, rng, f"{p}.class_embed", NCLS + 1, C)
    _mlp(sd, rng, f"{p}.mask_embed", C, C, C)
    _norm(sd, rng, f"{p}.decoder_norm", C)
    for li in range(DEC - 1):
        _mha(sd, rng, f"{p}.transformer_cross_attention_layers.{li}"
             ".multihead_attn", C)
        _norm(sd, rng, f"{p}.transformer_cross_attention_layers.{li}.norm", C)
        _mha(sd, rng, f"{p}.transformer_self_attention_layers.{li}"
             ".self_attn", C)
        _norm(sd, rng, f"{p}.transformer_self_attention_layers.{li}.norm", C)
        _linear(sd, rng, f"{p}.transformer_ffn_layers.{li}.linear1", FFN, C)
        _linear(sd, rng, f"{p}.transformer_ffn_layers.{li}.linear2", C, FFN)
        _norm(sd, rng, f"{p}.transformer_ffn_layers.{li}.norm", C)


def _bn(sd, rng, key, c):
    for stat in ("weight", "bias", "running_mean"):
        sd[f"{key}.{stat}"] = _t(rng, c)
    # variances must be positive (1/sqrt(var + eps) in FrozenBatchNorm)
    sd[f"{key}.running_var"] = torch.from_numpy(
        rng.uniform(0.5, 1.5, c).astype(np.float32))


def _synth_r50_backbone(sd, rng):
    """detectron2 R-50 keys (subset check is in test_weights.py; here the
    full import must route + consume them)."""
    sd["backbone.stem.conv1.weight"] = _t(rng, 64, 3, 7, 7)
    _bn(sd, rng, "backbone.stem.conv1.norm", 64)
    blocks = {2: 3, 3: 4, 4: 6, 5: 3}
    cin = {2: 64, 3: 256, 4: 512, 5: 1024}
    for r, n in blocks.items():
        mid = 64 * 2 ** (r - 2)
        out = mid * 4
        for b in range(n):
            i0 = cin[r] if b == 0 else out
            for c, (o, i, k) in enumerate(
                    [(mid, i0, 1), (mid, mid, 3), (out, mid, 1)], start=1):
                sd[f"backbone.res{r}.{b}.conv{c}.weight"] = _t(rng, o, i, k, k)
                _bn(sd, rng, f"backbone.res{r}.{b}.conv{c}.norm", o)
            if b == 0:
                sd[f"backbone.res{r}.{b}.shortcut.weight"] = _t(rng, out, i0, 1, 1)
                _bn(sd, rng, f"backbone.res{r}.{b}.shortcut.norm", out)


def _save(sd, tmp_path, name="ckpt.pth"):
    path = str(tmp_path / name)
    torch.save({"model": sd}, path)
    return path


@pytest.fixture(scope="module")
def dino_import(tmp_path_factory):
    rng = np.random.default_rng(7)
    sd = {}
    _synth_r50_backbone(sd, rng)
    _synth_pixel_decoder(sd, rng, LEVELS)
    _synth_maskdino_predictor(sd, rng)
    cfg = _tiny_cfg(dino=True)
    model, variables = _init_variables(cfg)
    path = _save(sd, tmp_path_factory.mktemp("dino"))
    new_vars, report = import_full_model_weights(path, variables)
    return sd, cfg, model, variables, new_vars, report


def test_maskdino_full_coverage(dino_import):
    sd, _, _, _, _, report = dino_import
    assert report["unmapped"] == []
    assert report["consumed"] == len(sd)
    assert report["applied"] > 100


def test_maskdino_transposes(dino_import):
    sd, _, _, _, new_vars, _ = dino_import
    p = new_vars["params"]
    # 1x1 conv -> Dense kernel (I, O)
    w = sd["sem_seg_head.pixel_decoder.input_proj.0.0.weight"].numpy()
    np.testing.assert_allclose(
        p["pixel_decoder"]["input_proj0"]["kernel"], w[:, :, 0, 0].T)
    # extra downsample 3x3 conv -> (kh, kw, I, O)
    w = sd["sem_seg_head.pixel_decoder.input_proj.3.0.weight"].numpy()
    np.testing.assert_allclose(
        p["pixel_decoder"]["input_proj_ds0"]["kernel"],
        w.transpose(2, 3, 1, 0))
    # norm-order swap: d2 norm2 (self-attn) -> our norm1
    w = sd["sem_seg_head.predictor.decoder.layers.0.norm2.weight"].numpy()
    np.testing.assert_allclose(
        p["predictor"]["layer0_norm1"]["scale"], w)
    # shared heads land in both decoder and enc two-stage modules
    w = sd["sem_seg_head.predictor.class_embed.weight"].numpy()
    np.testing.assert_allclose(p["predictor"]["class_embed"]["kernel"], w.T)
    np.testing.assert_allclose(
        p["predictor"]["enc_class_embed"]["kernel"], w.T)
    w = sd["sem_seg_head.predictor.decoder.bbox_embed.0.layers.2.weight"].numpy()
    np.testing.assert_allclose(p["predictor"]["box_embed"]["layer2"]["kernel"],
                               w.T)
    np.testing.assert_allclose(
        p["predictor"]["enc_box_embed"]["layer2"]["kernel"], w.T)
    # embedding tables copy verbatim
    w = sd["sem_seg_head.predictor.label_enc.weight"].numpy()
    np.testing.assert_allclose(p["predictor"]["dn_label_enc"], w)


def test_self_attn_matches_torch(dino_import):
    """Our MultiheadAttention with imported params == torch's."""
    sd, _, _, _, new_vars, _ = dino_import
    from vision_instance_seg_tpu.models.transformer_decoder import (
        MultiheadAttention)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, C)).astype(np.float32)

    tm = torch.nn.MultiheadAttention(C, NH, batch_first=True)
    pre = "sem_seg_head.predictor.decoder.layers.0.self_attn"
    with torch.no_grad():
        tm.in_proj_weight.copy_(sd[f"{pre}.in_proj_weight"])
        tm.in_proj_bias.copy_(sd[f"{pre}.in_proj_bias"])
        tm.out_proj.weight.copy_(sd[f"{pre}.out_proj.weight"])
        tm.out_proj.bias.copy_(sd[f"{pre}.out_proj.bias"])
        want, _ = tm(torch.from_numpy(x), torch.from_numpy(x),
                     torch.from_numpy(x))

    ours = MultiheadAttention(C, NH)
    params = {"params": new_vars["params"]["predictor"]["layer0_self_attn"]}
    got = ours.apply(params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_ffn_and_norm_match_torch(dino_import):
    sd, _, _, _, new_vars, _ = dino_import
    from vision_instance_seg_tpu.models.layers import LayerNorm

    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, C)).astype(np.float32)
    pre = "sem_seg_head.predictor.decoder.layers.0"
    tl1 = torch.nn.Linear(C, FFN)
    tl2 = torch.nn.Linear(FFN, C)
    tn = torch.nn.LayerNorm(C)
    with torch.no_grad():
        tl1.weight.copy_(sd[f"{pre}.linear1.weight"])
        tl1.bias.copy_(sd[f"{pre}.linear1.bias"])
        tl2.weight.copy_(sd[f"{pre}.linear2.weight"])
        tl2.bias.copy_(sd[f"{pre}.linear2.bias"])
        tn.weight.copy_(sd[f"{pre}.norm3.weight"])
        tn.bias.copy_(sd[f"{pre}.norm3.bias"])
        xt = torch.from_numpy(x)
        want = tn(xt + tl2(torch.relu(tl1(xt)))).numpy()

    import flax.linen as nn
    pp = new_vars["params"]["predictor"]
    y = nn.Dense(FFN).apply({"params": pp["layer0_ffn1"]}, jnp.asarray(x))
    y = nn.Dense(C).apply({"params": pp["layer0_ffn2"]}, jax.nn.relu(y))
    got = LayerNorm().apply({"params": pp["layer0_norm3"]},
                            jnp.asarray(x) + y)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_imported_model_forward_runs(dino_import):
    """The imported full tree must drive a finite forward pass."""
    _, cfg, model, _, new_vars, _ = dino_import
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out = model.apply(
        jax.tree_util.tree_map(jnp.asarray, new_vars),
        normalize_image(imgs, cfg), deterministic=True)
    assert np.isfinite(np.asarray(out["pred_logits"]).sum())
    assert np.isfinite(np.asarray(out["pred_masks"]).sum())


@pytest.mark.slow
def test_mask2former_full_coverage(tmp_path):
    rng = np.random.default_rng(11)
    sd = {}
    _synth_pixel_decoder(sd, rng, 3)
    _synth_mask2former_predictor(sd, rng)
    cfg = _tiny_cfg(dino=False)
    model, variables = _init_variables(cfg)
    path = _save(sd, tmp_path)
    new_vars, report = import_full_model_weights(path, variables)
    assert report["unmapped"] == []
    assert report["consumed"] == len(sd)
    # empty upstream input_proj -> ours must be exact identity
    k = new_vars["params"]["predictor"]["input_proj0"]["kernel"]
    np.testing.assert_allclose(k, np.eye(C))
    cls, masks = model.apply(
        jax.tree_util.tree_map(jnp.asarray, new_vars),
        normalize_image(jnp.zeros((1, 64, 64, 3), jnp.float32), cfg),
        deterministic=True)
    assert np.isfinite(np.asarray(cls).sum())


def test_halo_check_warns(caplog):
    import logging

    state = {"sem_seg_head.pixel_decoder.transformer.encoder.layers.0."
             "self_attn.sampling_offsets.bias": np.full(64, 9.0, np.float32)}
    with caplog.at_level(logging.WARNING):
        worst = check_sampling_offset_halo(state)
    assert worst == 9.0
    assert any("halo" in r.message for r in caplog.records)
