"""Stage-1/2 channel-pad layout experiment (VERDICT r4 #4).

The 69.5-img/s xplane names the flagship's residual HBM items as the
Swin stage-1/2 MLP / window-merge fusions over bf16[8,·,·,{96,192}]
running at ~160 GB/s effective (docs/PERF.md roofline). 96 and 192
channels are not multiples of the 128-lane vreg width, so those fusions
move partially-filled lane tiles (or XLA picks a minor-W layout whose
W extent is equally ragged). The one untried lever: run the stage-1/2
RESIDUAL STREAM lane-padded — 96→128, 192→256 — with zero-padded
kernels and a sum/c_real LayerNorm so the math is EXACT (padded
channels stay identically zero through conv/Dense/GELU because their
kernel rows/cols and gamma/beta are zero), at the cost of ~33% more
stage-1/2 matmul FLOPs. Attention stays at the logical width (qkv maps
Cp→3·96; heads 3×32 unchanged), so only layout-bound elementwise ops
widen.

Simulates patch-embed → stage-1 pair → patch-merge → stage-2 pair at
the flagship geometry (800 px, ws 8, bf16, batch 8) in both layouts.
Scan-timed with all-param perturbation (bench.py harness rules: one
lax.scan, every leaf perturbed, host float() barrier).

Replaces: measurement only — decides whether swin.py grows a pad knob.
"""

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from vision_instance_seg_tpu.models.swin import (
    _relative_position_index, _shift_attn_mask, _window_attention_nhd,
    window_partition, window_unpartition)

WS = 8
DT = jnp.bfloat16


def _ln(x, g, b, c_real):
    """LayerNorm whose statistics divide by c_real instead of the padded
    width: with zero padded channels, sum(x)/c_real and sum(x²)/c_real
    are the exact logical-width moments — no mask, no slice, fully
    fusable."""
    xf = x.astype(jnp.float32)
    mean = jnp.sum(xf, -1, keepdims=True) / c_real
    var = jnp.maximum(
        jnp.sum(xf * xf, -1, keepdims=True) / c_real - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    return (y * g + b).astype(x.dtype)


def _block(x, p, nh, hd, shift, c_real, mask, rel):
    b, h, w, cp = x.shape
    c = nh * hd
    n = WS * WS
    shortcut = x
    x = _ln(x, p["g1"], p["b1"], c_real)
    # window-pad like SwinBlock (800px stage 2 is 100x100 -> 104x104)
    hp, wp = -(-h // WS) * WS, -(-w // WS) * WS
    if hp != h or wp != w:
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    xw = window_partition(x, WS)                        # (nWt, N, Cp)
    nwt = xw.shape[0]
    qkv = xw @ p["wqkv"] + p["bqkv"]                    # (nWt, N, 3c)
    q = qkv[..., :c].reshape(nwt, n, nh, hd)
    k = qkv[..., c:2 * c].reshape(nwt, n, nh, hd)
    v = qkv[..., 2 * c:].reshape(nwt, n, nh, hd)
    out = _window_attention_nhd(q, k, v, rel, mask, hd ** -0.5)
    out = out.reshape(nwt, n, c) @ p["wproj"] + p["bproj"]   # (nWt, N, Cp)
    x = window_unpartition(out, WS, hp, wp)
    if shift:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = shortcut + x[:, :h, :w]
    y = _ln(x, p["g2"], p["b2"], c_real)
    y = jax.nn.gelu(y @ p["w1"] + p["bm1"], approximate=False)
    return x + (y @ p["w2"] + p["bm2"])


def _make_params(rng, cp1, cp2, c1=96, c2=192, hid1=384, hid2=768):
    """Zero-pad kernels beyond the logical widths so padded channels stay
    identically zero (values don't affect timing; they make the variant
    the real, exact computation)."""
    def dense(rng, i, o, i_real, o_real):
        w = rng.standard_normal((i, o)).astype(np.float32) * 0.02
        w[i_real:, :] = 0.0
        w[:, o_real:] = 0.0
        b = np.zeros((o,), np.float32)
        return w, b

    def blk(rng, cp, c, hid, nh):
        wqkv, bqkv = dense(rng, cp, 3 * c, c, 3 * c)
        wproj, bproj = dense(rng, c, cp, c, c)
        w1, bm1 = dense(rng, cp, hid, c, hid)
        w2, bm2 = dense(rng, hid, cp, hid, c)
        g = np.zeros((cp,), np.float32)
        g[:c] = 1.0
        rel = (rng.standard_normal(
            (nh, WS * WS, WS * WS)).astype(np.float32) * 0.02)
        return dict(wqkv=wqkv, bqkv=bqkv, wproj=wproj, bproj=bproj,
                    w1=w1, bm1=bm1, w2=w2, bm2=bm2,
                    g1=g, b1=np.zeros((cp,), np.float32),
                    g2=g.copy(), b2=np.zeros((cp,), np.float32), rel=rel)

    emb = rng.standard_normal((4, 4, 3, cp1)).astype(np.float32) * 0.02
    emb[..., c1:] = 0.0
    ge = np.zeros((cp1,), np.float32)
    ge[:c1] = 1.0
    wred, _ = dense(rng, 4 * cp1, cp2, 4 * cp1, c2)   # zeros land via gm
    gm = np.zeros((4 * cp1,), np.float32)
    for i in range(4):                     # real positions of the concat
        gm[i * cp1:i * cp1 + c1] = 1.0
    return dict(
        emb=emb, ge=ge, be=np.zeros((cp1,), np.float32),
        s1b0=blk(rng, cp1, c1, hid1, 3), s1b1=blk(rng, cp1, c1, hid1, 3),
        gm=gm, bm=np.zeros((4 * cp1,), np.float32), wred=wred,
        s2b0=blk(rng, cp2, c2, hid2, 6), s2b1=blk(rng, cp2, c2, hid2, 6))


def _forward(params, img, cp1, cp2, c1=96, c2=192):
    # patch embed: 4x4/4 conv + LN (padded output channels are zero)
    x = jax.lax.conv_general_dilated(
        img.astype(DT), params["emb"].astype(DT), (4, 4), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = _ln(x, params["ge"], params["be"], c1)
    h, w = x.shape[1], x.shape[2]
    m1 = jnp.asarray(_shift_attn_mask(-(-h // WS) * WS, -(-w // WS) * WS,
                                      WS, WS // 2))
    x = _block(x, params["s1b0"], 3, 32, 0, c1, None, params["s1b0"]["rel"])
    x = _block(x, params["s1b1"], 3, 32, WS // 2, c1, m1,
               params["s1b1"]["rel"])
    # patch merge (torch order) + c_real-LN + reduction
    x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                         x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
    x = _ln(x, params["gm"], params["bm"], 4 * c1)
    x = x @ params["wred"]
    h, w = x.shape[1], x.shape[2]
    m2 = jnp.asarray(_shift_attn_mask(-(-h // WS) * WS, -(-w // WS) * WS,
                                      WS, WS // 2))
    x = _block(x, params["s2b0"], 6, 32, 0, c2, None, params["s2b0"]["rel"])
    x = _block(x, params["s2b1"], 6, 32, WS // 2, c2, m2,
               params["s2b1"]["rel"])
    return jnp.sum(x.astype(jnp.float32))


def bench_variant(cp1, cp2, batch, size, iters, warmup=2, reps=5):
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        jnp.asarray, _make_params(rng, cp1, cp2))
    img = jnp.asarray(rng.standard_normal((batch, size, size, 3)),
                      jnp.float32)

    @jax.jit
    def run(params, img):
        def body(carry, _):
            p = jax.tree_util.tree_map(
                lambda lf: lf + carry.astype(lf.dtype) * 1e-30, params)
            return carry + _forward(p, img, cp1, cp2), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return out

    float(run(params, img))
    for _ in range(warmup):
        float(run(params, img))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(params, img))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) / reps * 1e3            # ms per pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    base = bench_variant(96, 192, args.batch, args.size, args.iters)
    pad = bench_variant(128, 256, args.batch, args.size, args.iters)
    print(json.dumps({
        "metric": "swin_stage12_lanepad_ms",
        "value": round(pad, 2), "unit": "ms/pass",
        "detail": {"baseline_96_192_ms": round(base, 2),
                   "padded_128_256_ms": round(pad, 2),
                   "speedup": round(base / pad, 3),
                   "batch": args.batch, "size": args.size}}))


if __name__ == "__main__":
    main()
