"""Weight-import fidelity tests: torch checkpoints -> JAX param trees.

SURVEY.md §7 hard part "weight-import fidelity": layer-name mapping plus
numerics checks against torch (CPU) on random inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


class TestOpConversions:
    def test_conv_matches_torch(self, rng):
        from flax import linen as nn

        from vision_instance_seg_tpu.utils.weights import _conv

        tconv = torch.nn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False)
        x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            ref = tconv(torch.from_numpy(x)).numpy()

        fconv = nn.Conv(8, (7, 7), strides=(2, 2), padding=3, use_bias=False)
        params = {"params": {"kernel": jnp.asarray(
            _conv(tconv.weight.detach().numpy()))}}
        got = fconv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   ref, rtol=1e-4, atol=1e-4)

    def test_dense_matches_torch(self, rng):
        from flax import linen as nn

        from vision_instance_seg_tpu.utils.weights import _dense

        tl = torch.nn.Linear(16, 24)
        x = rng.normal(size=(5, 16)).astype(np.float32)
        with torch.no_grad():
            ref = tl(torch.from_numpy(x)).numpy()
        fl = nn.Dense(24)
        params = {"params": {
            "kernel": jnp.asarray(_dense(tl.weight.detach().numpy())),
            "bias": jnp.asarray(tl.bias.detach().numpy())}}
        got = fl.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)

    def test_frozen_bn_matches_torch_eval(self, rng):
        from vision_instance_seg_tpu.models.layers import FrozenBatchNorm

        tbn = torch.nn.BatchNorm2d(6)
        with torch.no_grad():
            tbn.weight.copy_(torch.from_numpy(
                rng.normal(size=6).astype(np.float32)))
            tbn.bias.copy_(torch.from_numpy(
                rng.normal(size=6).astype(np.float32)))
            tbn.running_mean.copy_(torch.from_numpy(
                rng.normal(size=6).astype(np.float32)))
            tbn.running_var.copy_(torch.from_numpy(
                rng.random(6).astype(np.float32) + 0.5))
        tbn.eval()
        x = rng.normal(size=(2, 6, 8, 8)).astype(np.float32)
        with torch.no_grad():
            ref = tbn(torch.from_numpy(x)).numpy()

        fbn = FrozenBatchNorm(6)
        variables = {"frozen": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
            "mean": jnp.asarray(tbn.running_mean.numpy()),
            "var": jnp.asarray(tbn.running_var.numpy())}}
        got = fbn.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   ref, rtol=1e-4, atol=1e-4)


def synth_torchvision_r50(rng):
    """A torchvision-shaped R-50 state dict with random values.

    Weights are scaled ~fan-in so the 50-conv forward stays finite."""
    def normal(size, scale=0.02):
        return (rng.normal(size=size) * scale).astype(np.float32)
    sd = {}
    sd["conv1.weight"] = normal((64, 3, 7, 7))
    for stat in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{stat}"] = rng.random(64).astype(np.float32)
    blocks = {1: 3, 2: 4, 3: 6, 4: 3}
    in_ch = 64
    for layer, n in blocks.items():
        out_ch = 256 * (2 ** (layer - 1))
        mid = 64 * (2 ** (layer - 1))
        for b in range(n):
            p = f"layer{layer}.{b}"
            cin = in_ch if b == 0 else out_ch
            sd[f"{p}.conv1.weight"] = normal((mid, cin, 1, 1))
            sd[f"{p}.conv2.weight"] = normal((mid, mid, 3, 3))
            sd[f"{p}.conv3.weight"] = normal((out_ch, mid, 1, 1))
            for i, ch in (("1", mid), ("2", mid), ("3", out_ch)):
                for stat in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{p}.bn{i}.{stat}"] = rng.random(ch).astype(np.float32)
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = normal((out_ch, cin, 1, 1))
                for stat in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{p}.downsample.1.{stat}"] = rng.random(
                        out_ch).astype(np.float32)
        in_ch = out_ch
    sd["fc.weight"] = rng.normal(size=(1000, 2048)).astype(np.float32)
    sd["fc.bias"] = rng.normal(size=1000).astype(np.float32)
    return sd


@pytest.mark.slow
class TestResNetImport:
    def test_full_import_and_forward(self, rng, tmp_path):
        from vision_instance_seg_tpu.models.resnet import ResNet
        from vision_instance_seg_tpu.utils.weights import (
            import_backbone_weights)

        sd = synth_torchvision_r50(rng)
        path = tmp_path / "r50.pth"
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(path))

        model = ResNet(depth=50)
        x = jnp.zeros((1, 32, 32, 3))
        variables = jax.jit(model.init)(jax.random.key(0), x)
        updated = import_backbone_weights(str(path), variables)

        # stem kernel mapped with the conv transpose convention
        np.testing.assert_allclose(
            np.asarray(updated["params"]["stem_conv1"]["kernel"]),
            sd["conv1.weight"].transpose(2, 3, 1, 0))
        # frozen stats landed
        np.testing.assert_allclose(
            np.asarray(updated["frozen"]["res3_block0"]["shortcut_norm"]["mean"]),
            sd["layer2.0.downsample.1.running_mean"])
        # forward still runs with imported weights
        out = model.apply(updated, x)
        assert np.isfinite(np.asarray(out["res5"])).all()

    def test_detectron2_pkl_naming(self, rng, tmp_path):
        import pickle

        from vision_instance_seg_tpu.models.resnet import ResNet
        from vision_instance_seg_tpu.utils.weights import (
            import_backbone_weights)

        # detectron2-style keys for the stem + one block
        sd = {"stem.conv1.weight": rng.normal(size=(64, 3, 7, 7)
                                              ).astype(np.float32)}
        for stat in ("weight", "bias", "running_mean", "running_var"):
            sd[f"stem.conv1.norm.{stat}"] = rng.random(64).astype(np.float32)
        path = tmp_path / "r50.pkl"
        with open(path, "wb") as f:
            pickle.dump({"model": sd}, f)

        model = ResNet(depth=50)
        variables = jax.jit(model.init)(jax.random.key(0),
                                        jnp.zeros((1, 32, 32, 3)))
        updated = import_backbone_weights(str(path), variables)
        np.testing.assert_allclose(
            np.asarray(updated["params"]["stem_conv1"]["kernel"]),
            sd["stem.conv1.weight"].transpose(2, 3, 1, 0))


def synth_swin_t(rng):
    """Microsoft/timm-shaped Swin-T state dict (random values)."""
    sd = {"patch_embed.proj.weight": rng.normal(size=(96, 3, 4, 4)
                                                ).astype(np.float32),
          "patch_embed.proj.bias": rng.normal(size=96).astype(np.float32),
          "patch_embed.norm.weight": rng.random(96).astype(np.float32),
          "patch_embed.norm.bias": rng.random(96).astype(np.float32)}
    depths = [2, 2, 6, 2]
    heads = [3, 6, 12, 24]
    for s, (d, nh) in enumerate(zip(depths, heads)):
        dim = 96 * (2 ** s)
        for b in range(d):
            p = f"layers.{s}.blocks.{b}"
            for n in ("norm1", "norm2"):
                sd[f"{p}.{n}.weight"] = rng.random(dim).astype(np.float32)
                sd[f"{p}.{n}.bias"] = rng.random(dim).astype(np.float32)
            sd[f"{p}.attn.relative_position_bias_table"] = rng.normal(
                size=(169, nh)).astype(np.float32)
            sd[f"{p}.attn.relative_position_index"] = np.zeros(
                (49, 49), np.int64)
            sd[f"{p}.attn.qkv.weight"] = rng.normal(
                size=(3 * dim, dim)).astype(np.float32)
            sd[f"{p}.attn.qkv.bias"] = rng.normal(size=3 * dim
                                                  ).astype(np.float32)
            sd[f"{p}.attn.proj.weight"] = rng.normal(
                size=(dim, dim)).astype(np.float32)
            sd[f"{p}.attn.proj.bias"] = rng.normal(size=dim).astype(np.float32)
            sd[f"{p}.mlp.fc1.weight"] = rng.normal(
                size=(4 * dim, dim)).astype(np.float32)
            sd[f"{p}.mlp.fc1.bias"] = rng.normal(size=4 * dim
                                                 ).astype(np.float32)
            sd[f"{p}.mlp.fc2.weight"] = rng.normal(
                size=(dim, 4 * dim)).astype(np.float32)
            sd[f"{p}.mlp.fc2.bias"] = rng.normal(size=dim).astype(np.float32)
        if s < 3:
            sd[f"layers.{s}.downsample.reduction.weight"] = rng.normal(
                size=(2 * dim, 4 * dim)).astype(np.float32)
            sd[f"layers.{s}.downsample.norm.weight"] = rng.random(
                4 * dim).astype(np.float32)
            sd[f"layers.{s}.downsample.norm.bias"] = rng.random(
                4 * dim).astype(np.float32)
    return sd


@pytest.mark.slow
class TestSwinImport:
    def test_full_import(self, rng, tmp_path):
        from vision_instance_seg_tpu.models.swin import SwinTransformer
        from vision_instance_seg_tpu.utils.weights import (
            import_backbone_weights)

        sd = synth_swin_t(rng)
        path = tmp_path / "swin_t.pth"
        torch.save({"model": {k: torch.from_numpy(v)
                              for k, v in sd.items()}}, str(path))

        model = SwinTransformer(drop_path_rate=0.0)
        variables = jax.jit(model.init)(jax.random.key(0),
                                        jnp.zeros((1, 64, 64, 3)))
        updated = import_backbone_weights(str(path), variables)

        # stage 2 (depth 6) is nn.scan-folded: block 3 = pair 1, odd slot
        np.testing.assert_allclose(
            np.asarray(updated["params"]["stage2_blocks"]["block1"]["attn"]
                       ["qkv"]["kernel"])[1],
            sd["layers.2.blocks.3.attn.qkv.weight"].T)
        np.testing.assert_allclose(
            np.asarray(updated["params"]["stage1_block0"]["attn"]
                       ["relative_position_bias_table"]),
            sd["layers.1.blocks.0.attn.relative_position_bias_table"])
        np.testing.assert_allclose(
            np.asarray(updated["params"]["downsample0"]["reduction"]
                       ["kernel"]),
            sd["layers.0.downsample.reduction.weight"].T)
        out = model.apply(updated, jnp.zeros((1, 64, 64, 3)))
        assert np.isfinite(np.asarray(out["res5"])).all()

    def test_scanned_import_matches_loop_import(self, rng, tmp_path):
        """Importing the same torch checkpoint into the scanned and the
        per-block (scan_stages=False) models must yield identical
        forwards — proves the restack stacks the right blocks into the
        right pair slots."""
        from vision_instance_seg_tpu.models.swin import SwinTransformer
        from vision_instance_seg_tpu.utils.weights import (
            import_backbone_weights)

        sd = synth_swin_t(rng)
        path = tmp_path / "swin_t.pth"
        torch.save({"model": {k: torch.from_numpy(v)
                              for k, v in sd.items()}}, str(path))

        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        outs = {}
        for scan in (True, False):
            model = SwinTransformer(drop_path_rate=0.0, scan_stages=scan)
            variables = jax.jit(model.init)(jax.random.key(0), x)
            updated = import_backbone_weights(str(path), variables)
            outs[scan] = model.apply(updated, x)
        for k in outs[True]:
            # allclose, not equal: the scan body compiles as one unit, so
            # fusion/ordering may differ from the eager loop at ULP level;
            # a misplaced block would differ grossly
            np.testing.assert_allclose(np.asarray(outs[True][k]),
                                       np.asarray(outs[False][k]),
                                       rtol=1e-5, atol=1e-5, err_msg=k)

    def test_window_size_change_interpolates_bias_table(self, rng, tmp_path):
        """A window-7 checkpoint loads into a window-8 model: the rel-pos
        bias tables are bicubic-resized (microsoft load_pretrained
        convention), everything else imports exactly."""
        from vision_instance_seg_tpu.models.swin import SwinTransformer
        from vision_instance_seg_tpu.utils.weights import (
            import_backbone_weights)

        sd = synth_swin_t(rng)
        path = tmp_path / "swin_t.pth"
        torch.save({"model": {k: torch.from_numpy(v)
                              for k, v in sd.items()}}, str(path))

        model = SwinTransformer(drop_path_rate=0.0, window_size=8)
        variables = jax.jit(model.init)(jax.random.key(0),
                                        jnp.zeros((1, 64, 64, 3)))
        updated = import_backbone_weights(str(path), variables)

        tbl = np.asarray(updated["params"]["stage0_block0"]["attn"]
                         ["relative_position_bias_table"])
        assert tbl.shape == (15 * 15, 3)
        # non-table weights still import exactly
        np.testing.assert_allclose(
            np.asarray(updated["params"]["stage0_block0"]["attn"]["qkv"]
                       ["kernel"]),
            sd["layers.0.blocks.0.attn.qkv.weight"].T)
        out = model.apply(updated, jnp.zeros((1, 64, 64, 3)))
        assert np.isfinite(np.asarray(out["res5"])).all()


class TestRelPosResize:
    def test_constant_table_preserved(self):
        from vision_instance_seg_tpu.utils.weights import (
            _resize_rel_pos_table)
        v = np.full((13 * 13, 3), 0.7, np.float32)
        out = _resize_rel_pos_table(v, 15 * 15)
        assert out.shape == (15 * 15, 3)
        np.testing.assert_allclose(out, 0.7, rtol=1e-5)

    def test_stacked_tables_and_bad_shapes(self, rng):
        from vision_instance_seg_tpu.utils.weights import (
            _fit_rel_pos, _resize_rel_pos_table)
        v = rng.normal(size=(2, 13 * 13, 3)).astype(np.float32)
        out = _fit_rel_pos(v, (2, 15 * 15, 3))
        assert out.shape == (2, 15 * 15, 3)
        for i in range(2):
            np.testing.assert_allclose(
                out[i], _resize_rel_pos_table(v[i], 15 * 15))
        with pytest.raises(ValueError):
            _resize_rel_pos_table(v[0], 170)  # not a square length
        with pytest.raises(ValueError):
            _fit_rel_pos(v, (3, 15 * 15, 3))  # pair-count mismatch
