"""nn.scan layer folds: scanned stacked-param traces must match the plain
per-layer loop (swin stage pairs, window-encoder pairs) and stay
TP-shardable. Replaces nothing in the reference (its torch stack re-traces
every layer); this is TPU-native program-size/staging engineering
(docs/PERF.md roofline: per-layer HBM->SMEM param staging)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_instance_seg_tpu.models.swin import SwinTransformer
from vision_instance_seg_tpu.models.pixel_decoder import (
    MSDeformAttnPixelDecoder)


def _unstack_pairs(stacked: dict, prefix: str) -> dict:
    """{block0: tree[P,...], block1: tree[P,...]} -> per-layer subtrees
    named {prefix}{2i} / {prefix}{2i+1}."""
    out = {}
    pairs = jax.tree_util.tree_leaves(stacked["block0"])[0].shape[0]
    for i in range(pairs):
        for slot, name in ((0, 2 * i), (1, 2 * i + 1)):
            out[f"{prefix}{name}"] = jax.tree_util.tree_map(
                lambda a: a[i], stacked[f"block{slot}"])
    return out


def test_swin_stage_scan_matches_loop():
    kw = dict(embed_dim=16, depths=(2, 4), num_heads=(2, 4), window_size=4,
              patch_size=4, drop_path_rate=0.0,
              out_features=("res2", "res3"))
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 32, 32, 3)).astype(np.float32))

    scanned = SwinTransformer(scan_stages=True, **kw)
    vs = jax.jit(scanned.init)(jax.random.key(0), x)

    # stage 0 (depth 2) keeps the loop layout even when scanning is on
    assert "stage0_block0" in vs["params"] and "stage1_blocks" in vs["params"]
    loop_params = dict(vs["params"])
    loop_params.update(_unstack_pairs(loop_params.pop("stage1_blocks"),
                                      "stage1_block"))

    out_s = scanned.apply(vs, x)
    out_l = SwinTransformer(scan_stages=False, **kw).apply(
        {"params": loop_params}, x)
    for k in out_s:
        np.testing.assert_allclose(np.asarray(out_s[k]),
                                   np.asarray(out_l[k]),
                                   rtol=2e-6, atol=2e-6, err_msg=k)


def test_swin_stage_scan_trains():
    """Gradients flow through the scanned stage (drop-path rates ride as
    scanned inputs; dropout rng splits per pair)."""
    kw = dict(embed_dim=16, depths=(2, 4), num_heads=(2, 4), window_size=4,
              patch_size=4, drop_path_rate=0.2,
              out_features=("res3",), use_checkpoint=True)
    x = jnp.ones((1, 16, 16, 3), jnp.float32)
    model = SwinTransformer(scan_stages=True, **kw)
    vs = model.init({"params": jax.random.key(0)}, x)

    def loss(p):
        out = model.apply({"params": p}, x, deterministic=False,
                          rngs={"dropout": jax.random.key(1)})
        return jnp.sum(out["res3"] ** 2)

    g = jax.grad(loss)(vs["params"])
    leaves = jax.tree_util.tree_leaves(g["stage1_blocks"])
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

    # bf16 regression: drop-path divides by a TRACED f32 keep-prob (the
    # scanned per-layer rate) — without a cast that promoted the scan carry
    # bf16 -> f32 and lax.scan rejected the body (carry dtype mismatch)
    bf16 = SwinTransformer(scan_stages=True, dtype=jnp.bfloat16, **kw)
    vs16 = bf16.init({"params": jax.random.key(0)}, x)
    out16 = bf16.apply(vs16, x, deterministic=False,
                       rngs={"dropout": jax.random.key(1)})
    assert out16["res3"].dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out16["res3"], np.float32)).all()


def _wenc(scan: bool) -> MSDeformAttnPixelDecoder:
    return MSDeformAttnPixelDecoder(
        conv_dim=32, mask_dim=32, transformer_in_features=("res3", "res4",
                                                           "res5"),
        num_encoder_layers=4, num_heads=4, ffn_dim=64,
        encoder_attention="window", encoder_window_size=4,
        scan_wenc=scan, scan_unroll=2)


def test_window_encoder_scan_matches_loop():
    rng = np.random.default_rng(1)
    feats = {f"res{i}": jnp.asarray(rng.normal(
        size=(1, 32 // 2 ** (i - 2), 32 // 2 ** (i - 2), 32)
    ).astype(np.float32)) for i in range(2, 6)}

    scanned = _wenc(True)
    vs = jax.jit(scanned.init)(jax.random.key(0), feats)
    assert "wenc_layers" in vs["params"]
    loop_params = dict(vs["params"])
    loop_params.update(_unstack_pairs(loop_params.pop("wenc_layers"),
                                      "encoder_layer"))

    mf_s, outs_s = scanned.apply(vs, feats)
    mf_l, outs_l = _wenc(False).apply({"params": loop_params}, feats)
    np.testing.assert_allclose(np.asarray(mf_s), np.asarray(mf_l),
                               rtol=2e-6, atol=2e-6)
    for a, b in zip(outs_s, outs_l):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-6)


def test_stacked_params_tp_sharded():
    """param_shardings splits scanned (L, in, out) kernels over the model
    axis with the scan axis replicated — for all three scan folds."""
    from jax.sharding import Mesh

    from vision_instance_seg_tpu.parallel.mesh import param_shardings

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    kw = dict(embed_dim=16, depths=(2, 4), num_heads=(2, 4), window_size=4,
              patch_size=4, out_features=("res3",))
    x = jnp.ones((1, 16, 16, 3), jnp.float32)
    vs = jax.jit(SwinTransformer(scan_stages=True, **kw).init)(
        jax.random.key(0), x)
    tree = {"backbone": vs["params"]}
    sh = param_shardings(tree, mesh, min_size=0)
    qkv = sh["backbone"]["stage1_blocks"]["block0"]["attn"]["qkv"]["kernel"]
    assert qkv.spec == jax.sharding.PartitionSpec(None, None, "model")
    proj = sh["backbone"]["stage1_blocks"]["block1"]["attn"]["proj"]["kernel"]
    assert proj.spec == jax.sharding.PartitionSpec(None, "model", None)
    # the stacked bias table must stay replicated
    tbl = sh["backbone"]["stage1_blocks"]["block0"]["attn"][
        "relative_position_bias_table"]
    assert tbl.spec == jax.sharding.PartitionSpec()
