"""Torch twin of the reference MaskDINO R-50 forward (CPU, fp32, eval).

The reference evaluates COMPLETE trained checkpoints (reference
training/maskdino/evaluate.py:109-115: build_model + DetectionCheckpointer
.load + forward). Its model code lives in the external detectron2/MaskDINO
checkouts (train_original.py:16-29), not in this environment — so this
module re-implements that forward IN TORCH, hand-written from the upstream
IDEA-Research MaskDINO module layout (maskdino/modeling/pixel_decoder/
maskdino_encoder.py, .../transformer_decoder/{maskdino_decoder,
dino_decoder}.py, detectron2 resnet.py), emitting detectron2 state-dict
key names. tests/test_torch_parity.py then loads ONE random state dict
into BOTH this twin and (via utils/weights.import_full_model_weights) the
JAX model, and asserts the end-to-end forwards agree — the strongest
import-parity evidence obtainable without the reference's GPU stack.

Independence: everything here is derived from the upstream torch layout,
NOT from the JAX implementation — a semantics drift in either shows up as
a forward mismatch, exactly what the test is for.
"""

import math

import torch
import torch.nn.functional as F
from torch import nn


# --------------------------------------------------------------- backbone

class FrozenBatchNorm2d(nn.Module):
    """detectron2 FrozenBatchNorm2d (4 buffers, eps 1e-5)."""

    def __init__(self, c, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.register_buffer("weight", torch.ones(c))
        self.register_buffer("bias", torch.zeros(c))
        self.register_buffer("running_mean", torch.zeros(c))
        self.register_buffer("running_var", torch.ones(c))

    def forward(self, x):
        scale = self.weight * (self.running_var + self.eps).rsqrt()
        shift = self.bias - self.running_mean * scale
        return x * scale[None, :, None, None] + shift[None, :, None, None]


def _d2conv(cin, cout, k, stride=1, padding=0, bias=False, norm=None):
    """d2 Conv2d wrapper: the norm is an ATTRIBUTE of the conv module
    (keys ``<name>.weight`` + ``<name>.norm.*``)."""
    conv = nn.Conv2d(cin, cout, k, stride=stride, padding=padding, bias=bias)
    if norm is not None:
        conv.norm = norm
    return conv


def _apply_d2conv(conv, x, relu=False):
    x = conv(x)
    if hasattr(conv, "norm"):
        x = conv.norm(x)
    if relu:
        x = F.relu(x)
    return x


class Bottleneck(nn.Module):
    """d2 BottleneckBlock, STRIDE_IN_1X1=True (caffe-style R-50)."""

    def __init__(self, cin, cout, mid, stride):
        super().__init__()
        self.conv1 = _d2conv(cin, mid, 1, stride=stride,
                             norm=FrozenBatchNorm2d(mid))
        self.conv2 = _d2conv(mid, mid, 3, padding=1,
                             norm=FrozenBatchNorm2d(mid))
        self.conv3 = _d2conv(mid, cout, 1, norm=FrozenBatchNorm2d(cout))
        if cin != cout or stride != 1:
            self.shortcut = _d2conv(cin, cout, 1, stride=stride,
                                    norm=FrozenBatchNorm2d(cout))

    def forward(self, x):
        out = _apply_d2conv(self.conv1, x, relu=True)
        out = _apply_d2conv(self.conv2, out, relu=True)
        out = _apply_d2conv(self.conv3, out)
        sc = _apply_d2conv(self.shortcut, x) if hasattr(self, "shortcut") else x
        return F.relu(out + sc)


class Stem(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = _d2conv(3, 64, 7, stride=2, padding=3,
                             norm=FrozenBatchNorm2d(64))

    def forward(self, x):
        x = _apply_d2conv(self.conv1, x, relu=True)
        return F.max_pool2d(x, 3, stride=2, padding=1)


class ResNet50(nn.Module):
    """Emits d2 keys backbone.stem.* / backbone.res{2-5}.{b}.*"""

    def __init__(self):
        super().__init__()
        self.stem = Stem()
        blocks = {2: 3, 3: 4, 4: 6, 5: 3}
        cin = {2: 64, 3: 256, 4: 512, 5: 1024}
        for r, n in blocks.items():
            mid = 64 * 2 ** (r - 2)
            out = mid * 4
            stage = nn.Sequential(*[
                Bottleneck(cin[r] if b == 0 else out, out, mid,
                           stride=1 if r == 2 or b > 0 else 2)
                for b in range(n)])
            setattr(self, f"res{r}", stage)

    def forward(self, x):
        x = self.stem(x)
        feats = {}
        for r in (2, 3, 4, 5):
            x = getattr(self, f"res{r}")(x)
            feats[f"res{r}"] = x
        return feats


# --------------------------------------------- shared transformer pieces

def pos_sine_2d(h, w, dim):
    """PositionEmbeddingSine (DETR/Mask2Former): (dim, H, W)."""
    half = dim // 2
    y = torch.arange(1, h + 1, dtype=torch.float32)[:, None].expand(h, w)
    x = torch.arange(1, w + 1, dtype=torch.float32)[None, :].expand(h, w)
    eps, scale = 1e-6, 2 * math.pi
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    dim_t = torch.arange(half, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / half)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = torch.stack((px[:, :, 0::2].sin(), px[:, :, 1::2].cos()),
                     dim=3).flatten(2)
    py = torch.stack((py[:, :, 0::2].sin(), py[:, :, 1::2].cos()),
                     dim=3).flatten(2)
    return torch.cat((py, px), dim=2).permute(2, 0, 1)    # (dim, H, W)


def gen_sineembed(pos_tensor, dim):
    """DINO gen_sineembed_for_position: (B, Q, 4) -> (B, Q, 2*dim)."""
    half = dim // 2
    scale = 2 * math.pi
    dim_t = torch.arange(half, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / half)

    def emb(v):
        p = v[:, :, None] * scale / dim_t
        return torch.stack((p[:, :, 0::2].sin(), p[:, :, 1::2].cos()),
                           dim=3).flatten(2)

    x = emb(pos_tensor[:, :, 0])
    y = emb(pos_tensor[:, :, 1])
    w = emb(pos_tensor[:, :, 2])
    h = emb(pos_tensor[:, :, 3])
    return torch.cat((y, x, w, h), dim=2)


def inverse_sigmoid(x, eps=1e-3):
    """DINO util.misc.inverse_sigmoid (eps 1e-3)."""
    x = x.clamp(min=0, max=1)
    x1 = x.clamp(min=eps)
    x2 = (1 - x).clamp(min=eps)
    return torch.log(x1 / x2)


def ms_deform_attn_core(value, spatial_shapes, sampling_locations,
                        attention_weights):
    """Pure-torch MSDeformAttn core (the upstream CUDA op's pytorch
    fallback semantics): per-level grid_sample, bilinear, zeros padding,
    align_corners=False.

    value (B, S, nH, hd); sampling_locations (B, Q, nH, L, P, 2) in [0,1];
    attention_weights (B, Q, nH, L, P). Returns (B, Q, nH*hd).
    """
    b, _, nh, hd = value.shape
    q = sampling_locations.shape[1]
    nl, np_ = sampling_locations.shape[3:5]
    splits = [h * w for h, w in spatial_shapes]
    value_list = value.split(splits, dim=1)
    grids = 2 * sampling_locations - 1
    sampled = []
    for lid, (h, w) in enumerate(spatial_shapes):
        v = (value_list[lid].flatten(2).transpose(1, 2)
             .reshape(b * nh, hd, h, w))
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)  # (B*nH, Q, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)                 # (B*nH, hd, Q, P)
        sampled.append(s)
    attn = (attention_weights.transpose(1, 2)
            .reshape(b * nh, 1, q, nl * np_))
    out = ((torch.stack(sampled, dim=-2).flatten(-2) * attn).sum(-1)
           .view(b, nh * hd, q))
    return out.transpose(1, 2).contiguous()


class MSDeformAttn(nn.Module):
    def __init__(self, d_model, n_levels, n_heads, n_points):
        super().__init__()
        self.n_levels, self.n_heads, self.n_points = n_levels, n_heads, n_points
        self.sampling_offsets = nn.Linear(d_model,
                                          n_heads * n_levels * n_points * 2)
        self.attention_weights = nn.Linear(d_model,
                                           n_heads * n_levels * n_points)
        self.value_proj = nn.Linear(d_model, d_model)
        self.output_proj = nn.Linear(d_model, d_model)

    def forward(self, query, reference_points, src, spatial_shapes):
        """query (B, Q, C) with pos already added; reference_points
        (B, Q, L, 2|4) normalized; src (B, S, C)."""
        b, q, c = query.shape
        nh, nl, npts = self.n_heads, self.n_levels, self.n_points
        v = self.value_proj(src).view(b, -1, nh, c // nh)
        off = self.sampling_offsets(query).view(b, q, nh, nl, npts, 2)
        aw = self.attention_weights(query).view(b, q, nh, nl * npts)
        aw = aw.softmax(-1).view(b, q, nh, nl, npts)
        if reference_points.shape[-1] == 2:
            wh = torch.tensor([[w, h] for h, w in spatial_shapes],
                              dtype=torch.float32)
            loc = (reference_points[:, :, None, :, None, :]
                   + off / wh[None, None, None, :, None, :])
        else:
            ref = reference_points
            loc = (ref[:, :, None, :, None, :2]
                   + off / npts * ref[:, :, None, :, None, 2:] * 0.5)
        out = ms_deform_attn_core(v, spatial_shapes, loc, aw)
        return self.output_proj(out)


class MLP(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.layers = nn.ModuleList(
            nn.Linear(dims[i], dims[i + 1]) for i in range(len(dims) - 1))

    def forward(self, x):
        for i, layer in enumerate(self.layers):
            x = layer(x) if i == len(self.layers) - 1 else F.relu(layer(x))
        return x


# ----------------------------------------------------------- pixel decoder

class DeformableEncoderLayer(nn.Module):
    def __init__(self, c, nh, nl, npts, ffn):
        super().__init__()
        self.self_attn = MSDeformAttn(c, nl, nh, npts)
        self.norm1 = nn.LayerNorm(c)
        self.linear1 = nn.Linear(c, ffn)
        self.linear2 = nn.Linear(ffn, c)
        self.norm2 = nn.LayerNorm(c)

    def forward(self, src, pos, ref, shapes):
        src = self.norm1(src + self.self_attn(src + pos, ref, src, shapes))
        y = self.linear2(F.relu(self.linear1(src)))
        return self.norm2(src + y)


class PixelDecoder(nn.Module):
    """maskdino_encoder.MSDeformAttnPixelDecoder twin (4s_dowsample1)."""

    def __init__(self, c, nh, npts, ffn, n_enc, levels,
                 bb_ch=(2048, 1024, 512), lateral_ch=256):
        super().__init__()
        self.c, self.levels = c, levels
        n_tf = len(bb_ch)
        projs = [nn.Sequential(nn.Conv2d(ch, c, 1), nn.GroupNorm(32, c))
                 for ch in bb_ch]
        for k in range(levels - n_tf):
            cin = bb_ch[0] if k == 0 else c
            projs.append(nn.Sequential(
                nn.Conv2d(cin, c, 3, stride=2, padding=1),
                nn.GroupNorm(32, c)))
        self.input_proj = nn.ModuleList(projs)
        transformer = nn.Module()
        transformer.level_embed = nn.Parameter(torch.zeros(levels, c))
        encoder = nn.Module()
        encoder.layers = nn.ModuleList(
            DeformableEncoderLayer(c, nh, levels, npts, ffn)
            for _ in range(n_enc))
        transformer.encoder = encoder
        self.transformer = transformer
        self.lateral_convs = nn.ModuleList(
            [_d2conv(lateral_ch, c, 1, norm=nn.GroupNorm(32, c))])
        self.output_convs = nn.ModuleList(
            [_d2conv(c, c, 3, padding=1, norm=nn.GroupNorm(32, c))])
        self.mask_features = nn.Conv2d(c, c, 1)

    def forward(self, feats):
        c = self.c
        # transformer features: [res5, res4, res3] projected, then stride-2
        # extras off res5; assembled lowest-resolution-first =
        # [ds..., res5, res4, res3]
        tf = [self.input_proj[i](feats[n])
              for i, n in enumerate(("res5", "res4", "res3"))]
        extra = []
        prev = feats["res5"]
        for k in range(self.levels - 3):
            x = self.input_proj[3 + k](prev)
            extra.insert(0, x)
            prev = x
        maps = extra + [tf[0], tf[1], tf[2]]
        b = maps[0].shape[0]
        srcs, poss, shapes = [], [], []
        for i, m in enumerate(maps):
            h, w = m.shape[-2:]
            shapes.append((h, w))
            srcs.append(m.flatten(2).transpose(1, 2))     # (B, HW, C)
            pos = pos_sine_2d(h, w, c).flatten(1).transpose(0, 1)
            poss.append(pos[None].expand(b, -1, -1)
                        + self.transformer.level_embed[i])
        src = torch.cat(srcs, 1)
        pos = torch.cat(poss, 1)
        refs = []
        for (h, w) in shapes:
            ys = (torch.arange(h, dtype=torch.float32) + 0.5) / h
            xs = (torch.arange(w, dtype=torch.float32) + 0.5) / w
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            refs.append(torch.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        ref = torch.cat(refs, 0)[None, :, None, :].expand(
            b, -1, len(shapes), -1)
        for layer in self.transformer.encoder.layers:
            src = layer(src, pos, ref, shapes)
        outs, off = [], 0
        for (h, w) in shapes:
            outs.append(src[:, off:off + h * w].transpose(1, 2)
                        .reshape(b, c, h, w))
            off += h * w
        # FPN: res2 lateral + upsampled FINEST encoder level (out[-1])
        lat = _apply_d2conv(self.lateral_convs[0], feats["res2"])
        y = lat + F.interpolate(outs[-1], size=lat.shape[-2:],
                                mode="bilinear", align_corners=False)
        y = _apply_d2conv(self.output_convs[0], y, relu=True)
        return self.mask_features(y), outs


# -------------------------------------------------------------- predictor

class DecoderLayer(nn.Module):
    """dino_decoder.DeformableTransformerDecoderLayer: self-attn -> norm2,
    cross-attn -> norm1, ffn -> norm3."""

    def __init__(self, c, nh, nl, npts, ffn):
        super().__init__()
        self.cross_attn = MSDeformAttn(c, nl, nh, npts)
        self.norm1 = nn.LayerNorm(c)
        self.self_attn = nn.MultiheadAttention(c, nh, batch_first=True)
        self.norm2 = nn.LayerNorm(c)
        self.linear1 = nn.Linear(c, ffn)
        self.linear2 = nn.Linear(ffn, c)
        self.norm3 = nn.LayerNorm(c)

    def forward(self, tgt, qpos, refs4, memory, shapes):
        q = k = tgt + qpos
        tgt2 = self.self_attn(q, k, tgt, need_weights=False)[0]
        tgt = self.norm2(tgt + tgt2)
        tgt2 = self.cross_attn(tgt + qpos, refs4, memory, shapes)
        tgt = self.norm1(tgt + tgt2)
        tgt2 = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm3(tgt + tgt2)


class MaskDINOPredictor(nn.Module):
    """maskdino_decoder.MaskDINODecoder twin (two-stage, eval path)."""

    def __init__(self, c, nh, npts, ffn, n_dec, levels, ncls, nq):
        super().__init__()
        self.c, self.ncls, self.nq, self.levels = c, ncls, nq, levels
        self.class_embed = nn.Linear(c, ncls)
        self.label_enc = nn.Embedding(ncls + 1, c)
        self.mask_embed = MLP([c, c, c, c])
        self.enc_output = nn.Linear(c, c)
        self.enc_output_norm = nn.LayerNorm(c)
        decoder = nn.Module()
        decoder.norm = nn.LayerNorm(c)
        decoder.ref_point_head = MLP([2 * c, c, c])
        shared_box = MLP([c, c, c, 4])
        decoder.bbox_embed = nn.ModuleList([shared_box] * n_dec)
        decoder.layers = nn.ModuleList(
            DecoderLayer(c, nh, levels, npts, ffn) for _ in range(n_dec))
        self.decoder = decoder

    def _heads(self, x, mask_features):
        y = self.decoder.norm(x)
        cls = self.class_embed(y)
        emb = self.mask_embed(y)
        masks = torch.einsum("bqc,bchw->bqhw", emb, mask_features)
        return cls, masks

    def forward(self, maps, mask_features):
        c = self.c
        b = mask_features.shape[0]
        srcs, shapes = [], []
        for m in maps:
            h, w = m.shape[-2:]
            shapes.append((h, w))
            srcs.append(m.flatten(2).transpose(1, 2))
        memory = torch.cat(srcs, 1)                       # (B, S, C)

        # ---- two-stage (gen_encoder_output_proposals semantics)
        anchors, valids = [], []
        for lvl, (h, w) in enumerate(shapes):
            ys = (torch.arange(h, dtype=torch.float32) + 0.5) / h
            xs = (torch.arange(w, dtype=torch.float32) + 0.5) / w
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            wh = torch.full((h * w, 2), 0.05 * 2.0 ** lvl)
            a = torch.cat([gx.reshape(-1, 1), gy.reshape(-1, 1), wh], 1)
            anchors.append(a)
            valids.append(((a > 0.01) & (a < 0.99)).all(-1))
        anchors = torch.cat(anchors, 0)
        valid = torch.cat(valids, 0)
        proposals = torch.where(valid[:, None],
                                inverse_sigmoid(anchors, eps=1e-3),
                                torch.tensor(1e4))
        output_memory = torch.where(valid[None, :, None], memory,
                                    torch.tensor(0.0))
        output_memory = self.enc_output_norm(self.enc_output(output_memory))
        enc_cls = self.class_embed(output_memory)
        enc_coord = self.decoder.bbox_embed[0](output_memory) + proposals
        score = enc_cls[..., :self.ncls].max(-1).values
        top_idx = torch.topk(score, self.nq, dim=1).indices
        gather = top_idx[..., None]
        tgt_undetach = torch.gather(output_memory, 1, gather.expand(-1, -1, c))
        ref_undetach = torch.gather(enc_coord, 1, gather.expand(-1, -1, 4))
        interm_cls, interm_mask = self._heads(tgt_undetach, mask_features)
        interm_boxes = ref_undetach.sigmoid()
        tgt = tgt_undetach.detach()
        refs = interm_boxes.detach()

        # ---- decoder loop (dino_decoder.TransformerDecoder + pred_box)
        cls_list, mask_list, box_list = [], [], []
        cls0, mask0 = self._heads(tgt, mask_features)     # initial_pred
        cls_list.append(cls0)
        mask_list.append(mask0)
        box_list.append(refs)
        x = tgt
        for li, layer in enumerate(self.decoder.layers):
            sine = gen_sineembed(refs, c)
            qpos = self.decoder.ref_point_head(sine)
            refs4 = refs[:, :, None, :].expand(-1, -1, len(shapes), -1)
            x = layer(x, qpos, refs4, memory, shapes)
            hs = self.decoder.norm(x)
            # reported box: bbox_embed on NORMED hs (pred_box); internal
            # next ref: bbox_embed on RAW output (decoder loop), detached
            rep = (self.decoder.bbox_embed[li](hs)
                   + inverse_sigmoid(refs, eps=1e-3)).sigmoid()
            new_ref = (self.decoder.bbox_embed[li](x)
                       + inverse_sigmoid(refs, eps=1e-3)).sigmoid()
            cls_l, mask_l = self._heads(x, mask_features)
            cls_list.append(cls_l)
            mask_list.append(mask_l)
            box_list.append(rep)
            refs = new_ref.detach()
        return {
            "pred_logits": torch.stack(cls_list),
            "pred_masks": torch.stack(mask_list),
            "pred_boxes": torch.stack(box_list),
            "enc_cls": interm_cls,
            "enc_masks": interm_mask,
            "enc_boxes": interm_boxes,
        }


class TwinMaskDINO(nn.Module):
    """Full twin: state_dict keys match detectron2's checkpoint layout."""

    def __init__(self, c=32, nh=4, npts=4, enc_ffn=1024, dec_ffn=64,
                 n_enc=2, n_dec=2, levels=4, ncls=1, nq=8):
        super().__init__()
        self.backbone = ResNet50()
        sem_seg_head = nn.Module()
        sem_seg_head.pixel_decoder = PixelDecoder(
            c, nh, npts, enc_ffn, n_enc, levels)
        sem_seg_head.predictor = MaskDINOPredictor(
            c, nh, npts, dec_ffn, n_dec, levels, ncls, nq)
        self.sem_seg_head = sem_seg_head

    def forward(self, images_nchw):
        feats = self.backbone(images_nchw)
        mask_features, maps = self.sem_seg_head.pixel_decoder(feats)
        return self.sem_seg_head.predictor(maps, mask_features)


# ------------------------------------------------- Mask2Former predictor

class M2FAttention(nn.Module):
    """One {cross,self}-attention layer of the upstream
    MultiScaleMaskedTransformerDecoder (post-norm): keys
    ``<name>.multihead_attn|self_attn`` + ``<name>.norm``."""

    def __init__(self, c, nh, cross):
        super().__init__()
        attn = nn.MultiheadAttention(c, nh, batch_first=True)
        if cross:
            self.multihead_attn = attn
        else:
            self.self_attn = attn
        self.norm = nn.LayerNorm(c)
        self._cross = cross

    def forward(self, tgt, qpos, memory=None, pos=None, attn_mask=None):
        if self._cross:
            tgt2 = self.multihead_attn(
                tgt + qpos, memory + pos, memory,
                attn_mask=attn_mask, need_weights=False)[0]
        else:
            q = k = tgt + qpos
            tgt2 = self.self_attn(q, k, tgt, need_weights=False)[0]
        return self.norm(tgt + tgt2)


class M2FFFN(nn.Module):
    def __init__(self, c, ffn):
        super().__init__()
        self.linear1 = nn.Linear(c, ffn)
        self.linear2 = nn.Linear(ffn, c)
        self.norm = nn.LayerNorm(c)

    def forward(self, tgt):
        return self.norm(tgt + self.linear2(F.relu(self.linear1(tgt))))


class Mask2FormerPredictor(nn.Module):
    """mask2former_transformer_decoder.MultiScaleMaskedTransformerDecoder
    twin (eval). input_proj entries are EMPTY Sequentials at conv_dim ==
    hidden_dim, exactly as upstream — no keys, identity projection."""

    def __init__(self, c, nh, ffn, n_dec, ncls, nq, nlvl=3):
        super().__init__()
        self.c, self.nh, self.nlvl = c, nh, nlvl
        self.query_feat = nn.Embedding(nq, c)
        self.query_embed = nn.Embedding(nq, c)
        self.level_embed = nn.Embedding(nlvl, c)
        self.class_embed = nn.Linear(c, ncls + 1)
        self.mask_embed = MLP([c, c, c, c])
        self.decoder_norm = nn.LayerNorm(c)
        self.transformer_cross_attention_layers = nn.ModuleList(
            M2FAttention(c, nh, cross=True) for _ in range(n_dec))
        self.transformer_self_attention_layers = nn.ModuleList(
            M2FAttention(c, nh, cross=False) for _ in range(n_dec))
        self.transformer_ffn_layers = nn.ModuleList(
            M2FFFN(c, ffn) for _ in range(n_dec))

    def _predict(self, x, mask_features, target_hw):
        y = self.decoder_norm(x)
        cls = self.class_embed(y)
        emb = self.mask_embed(y)
        masks = torch.einsum("bqc,bchw->bqhw", emb, mask_features)
        am = F.interpolate(masks, size=target_hw, mode="bilinear",
                           align_corners=False)
        am = (am.sigmoid().flatten(2) < 0.5)          # (B, Q, hw) bool
        empty = am.all(-1, keepdim=True)
        am = am & ~empty                              # unmask empty queries
        b, q, hw = am.shape
        am = am[:, None].expand(b, self.nh, q, hw).reshape(b * self.nh, q, hw)
        return cls, masks, am

    def forward(self, maps, mask_features):
        b = mask_features.shape[0]
        srcs, poss, shapes = [], [], []
        for i, m in enumerate(maps[:self.nlvl]):
            h, w = m.shape[-2:]
            shapes.append((h, w))
            srcs.append(m.flatten(2).transpose(1, 2)
                        + self.level_embed.weight[i])
            poss.append(pos_sine_2d(h, w, self.c).flatten(1).transpose(0, 1)
                        [None].expand(b, -1, -1))
        x = self.query_feat.weight[None].expand(b, -1, -1)
        qpos = self.query_embed.weight[None].expand(b, -1, -1)
        cls_list, mask_list = [], []
        cls, masks, am = self._predict(x, mask_features, shapes[0])
        cls_list.append(cls)
        mask_list.append(masks)
        n_dec = len(self.transformer_cross_attention_layers)
        for li in range(n_dec):
            lvl = li % self.nlvl
            x = self.transformer_cross_attention_layers[li](
                x, qpos, srcs[lvl], poss[lvl], attn_mask=am)
            x = self.transformer_self_attention_layers[li](x, qpos)
            x = self.transformer_ffn_layers[li](x)
            cls, masks, am = self._predict(
                x, mask_features, shapes[(li + 1) % self.nlvl])
            cls_list.append(cls)
            mask_list.append(masks)
        return {"pred_logits": torch.stack(cls_list),
                "pred_masks": torch.stack(mask_list)}


class TwinMask2Former(nn.Module):
    """Full Mask2Former R-50 twin (3 encoder levels, no ds extras)."""

    def __init__(self, c=32, nh=4, npts=4, enc_ffn=1024, dec_ffn=64,
                 n_enc=2, n_dec=2, ncls=1, nq=8):
        super().__init__()
        self.backbone = ResNet50()
        sem_seg_head = nn.Module()
        sem_seg_head.pixel_decoder = PixelDecoder(
            c, nh, npts, enc_ffn, n_enc, levels=3)
        sem_seg_head.predictor = Mask2FormerPredictor(
            c, nh, dec_ffn, n_dec, ncls, nq)
        self.sem_seg_head = sem_seg_head

    def forward(self, images_nchw):
        feats = self.backbone(images_nchw)
        mask_features, maps = self.sem_seg_head.pixel_decoder(feats)
        return self.sem_seg_head.predictor(maps, mask_features)


# ------------------------------------------------- Swin backbone (det fork)

class SwinWindowAttentionT(nn.Module):
    """W-MSA with relative position bias (microsoft Swin layout)."""

    def __init__(self, dim, ws, nh):
        super().__init__()
        self.ws, self.nh = ws, nh
        self.scale = (dim // nh) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * ws - 1) ** 2, nh))
        coords = torch.stack(torch.meshgrid(
            torch.arange(ws), torch.arange(ws), indexing="ij"))  # 2, ws, ws
        flat = coords.flatten(1)                                 # 2, N
        rel = flat[:, :, None] - flat[:, None, :]                # 2, N, N
        rel = rel.permute(1, 2, 0) + (ws - 1)
        idx = rel[:, :, 0] * (2 * ws - 1) + rel[:, :, 1]
        self.register_buffer("relative_position_index", idx,
                             persistent=False)
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask):
        b_, n, c = x.shape
        qkv = (self.qkv(x).reshape(b_, n, 3, self.nh, c // self.nh)
               .permute(2, 0, 3, 1, 4))
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.reshape(-1)].reshape(n, n, self.nh)
        attn = attn + bias.permute(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = (attn.view(b_ // nw, nw, self.nh, n, n)
                    + mask[None, :, None]).view(b_, self.nh, n, n)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


class SwinMlpT(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


def _swin_window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return (x.permute(0, 1, 3, 2, 4, 5).contiguous()
            .view(-1, ws * ws, c))


def _swin_window_reverse(win, ws, h, w):
    b = win.shape[0] // (h * w // ws // ws)
    x = win.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(b, h, w, -1)


def _swin_shift_mask(hp, wp, ws, shift):
    img = torch.zeros(1, hp, wp, 1)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl] = cnt
            cnt += 1
    win = _swin_window_partition(img, ws).view(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return diff.masked_fill(diff != 0, -100.0).masked_fill(diff == 0, 0.0)


class SwinBlockT(nn.Module):
    def __init__(self, dim, nh, ws, shift, mlp_ratio=4.0):
        super().__init__()
        self.ws, self.shift = ws, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = SwinWindowAttentionT(dim, ws, nh)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = SwinMlpT(dim, int(dim * mlp_ratio))

    def forward(self, x):
        # x: (B, H, W, C) — pad to window multiples inside, like upstream
        b, h, w, c = x.shape
        ws = self.ws
        shortcut = x
        x = self.norm1(x)
        ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
        if ph or pw:
            x = F.pad(x, (0, 0, 0, pw, 0, ph))
        hp, wp = h + ph, w + pw
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
            mask = _swin_shift_mask(hp, wp, ws, self.shift)
        else:
            mask = None
        xw = _swin_window_partition(x, ws)
        xw = self.attn(xw, mask)
        x = _swin_window_reverse(xw, ws, hp, wp)
        if self.shift:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + x[:, :h, :w]
        return x + self.mlp(self.norm2(x))


class PatchMergingT(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = F.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                       x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
        return self.reduction(self.norm(x))


class SwinT(nn.Module):
    """Detection-fork Swin backbone twin (timm/microsoft key layout:
    patch_embed.proj/.norm, layers.{s}.blocks.{b}.*,
    layers.{s}.downsample.*, per-stage out norms norm{0..3})."""

    def __init__(self, dim=32, depths=(2, 2, 2, 2), heads=(2, 2, 2, 2),
                 ws=7):
        super().__init__()
        patch_embed = nn.Module()
        patch_embed.proj = nn.Conv2d(3, dim, 4, stride=4)
        patch_embed.norm = nn.LayerNorm(dim)
        self.patch_embed = patch_embed
        self.layers = nn.ModuleList()
        for s, depth in enumerate(depths):
            d = dim * 2 ** s
            stage = nn.Module()
            stage.blocks = nn.ModuleList(
                SwinBlockT(d, heads[s], ws, 0 if i % 2 == 0 else ws // 2)
                for i in range(depth))
            if s < len(depths) - 1:
                stage.downsample = PatchMergingT(d)
            self.layers.append(stage)
            self.add_module(f"norm{s}", nn.LayerNorm(d))

    def forward(self, images_nchw):
        x = self.patch_embed.proj(images_nchw)        # (B, C, H/4, W/4)
        x = x.permute(0, 2, 3, 1)                     # NHWC
        x = self.patch_embed.norm(x)
        feats = {}
        for s, stage in enumerate(self.layers):
            for blk in stage.blocks:
                x = blk(x)
            f = getattr(self, f"norm{s}")(x)
            feats[f"res{s + 2}"] = f.permute(0, 3, 1, 2)   # NCHW out
            if hasattr(stage, "downsample"):
                x = stage.downsample(x)
        return feats


class TwinSwinMask2Former(nn.Module):
    """Mask2Former with the Swin twin backbone (flagship family import)."""

    def __init__(self, c=32, nh=4, npts=4, enc_ffn=1024, dec_ffn=64,
                 n_enc=2, n_dec=2, ncls=1, nq=8, swin_dim=32, ws=7,
                 depths=(2, 2, 2, 2)):
        super().__init__()
        self.backbone = SwinT(dim=swin_dim, ws=ws, depths=depths)
        bb = (swin_dim * 8, swin_dim * 4, swin_dim * 2)   # res5, res4, res3
        sem_seg_head = nn.Module()
        sem_seg_head.pixel_decoder = PixelDecoder(
            c, nh, npts, enc_ffn, n_enc, levels=3, bb_ch=bb,
            lateral_ch=swin_dim)
        sem_seg_head.predictor = Mask2FormerPredictor(
            c, nh, dec_ffn, n_dec, ncls, nq)
        self.sem_seg_head = sem_seg_head

    def forward(self, images_nchw):
        feats = self.backbone(images_nchw)
        mask_features, maps = self.sem_seg_head.pixel_decoder(feats)
        return self.sem_seg_head.predictor(maps, mask_features)
