"""Pallas kernel golden tests vs pure-jnp references (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
class TestFusedWindowAttention:
    def _run(self, b, nw, nh, n, hd, shift, seed=0):
        from vision_instance_seg_tpu.kernels.window_attention import (
            fused_window_attention)
        from vision_instance_seg_tpu.models.swin import (
            reference_window_attention)

        rng = np.random.default_rng(seed)
        nwt = b * nw
        q = jnp.asarray(rng.normal(size=(nwt, nh, n, hd)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(nwt, nh, n, hd)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(nwt, nh, n, hd)), jnp.float32)
        rel = jnp.asarray(rng.normal(size=(nh, n, n)), jnp.float32)
        mask = None
        if shift:
            mask = np.zeros((nw, n, n), np.float32)
            # mimic a real shift mask: block some pairs hard
            mask[:, : n // 2, n // 2:] = -100.0
            mask[:, n // 2:, : n // 2] = -100.0
            mask = jnp.asarray(mask)
        scale = hd ** -0.5
        ref = reference_window_attention(q, k, v, rel, mask, scale, nw)
        got = fused_window_attention(q, k, v, rel, mask, scale, nw,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_even_windows_no_shift(self):
        self._run(b=1, nw=4, nh=2, n=49, hd=32, shift=False)

    def test_odd_windows_with_shift(self):
        self._run(b=2, nw=3, nh=3, n=49, hd=32, shift=True)

    def test_single_window(self):
        self._run(b=1, nw=1, nh=2, n=49, hd=32, shift=False)

    def test_small_tokens(self):
        self._run(b=1, nw=2, nh=1, n=16, hd=8, shift=True)

    def _run_geo(self, b, wh, ww, nh, ws, hd, shift, seed=0):
        """Geometry-mask kernel vs reference with the materialized mask."""
        from vision_instance_seg_tpu.kernels.window_attention import (
            fused_window_attention)
        from vision_instance_seg_tpu.models.swin import (
            _shift_attn_mask, reference_window_attention)

        hp, wp = wh * ws, ww * ws
        nw = wh * ww
        n = ws * ws
        rng = np.random.default_rng(seed)
        nwt = b * nw
        q = jnp.asarray(rng.normal(size=(nwt, nh, n, hd)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(nwt, nh, n, hd)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(nwt, nh, n, hd)), jnp.float32)
        rel = jnp.asarray(rng.normal(size=(nh, n, n)), jnp.float32)
        mask = (jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
                if shift else None)
        scale = hd ** -0.5
        ref = reference_window_attention(q, k, v, rel, mask, scale, nw)
        got = fused_window_attention(q, k, v, rel, None, scale, nw,
                                     interpret=True,
                                     geometry=(hp, wp, ws, shift))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_geo_mask_unshifted(self):
        self._run_geo(b=1, wh=3, ww=4, nh=2, ws=7, hd=32, shift=0)

    def test_geo_mask_shifted(self):
        self._run_geo(b=2, wh=3, ww=3, nh=3, ws=7, hd=32, shift=3)

    def test_geo_mask_shifted_many_pairs(self):
        # > max_pairs windows: exercises the multi-pair packing + padding
        self._run_geo(b=1, wh=5, ww=5, nh=2, ws=4, hd=16, shift=2)

    def test_geo_gradients_match_reference(self):
        from vision_instance_seg_tpu.kernels.window_attention import (
            fused_window_attention)
        from vision_instance_seg_tpu.models.swin import (
            _shift_attn_mask, reference_window_attention)

        wh = ww = 2
        ws, nh, hd, shift = 4, 2, 8, 2
        hp, wp = wh * ws, ww * ws
        nw, n = wh * ww, ws * ws
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(nw, nh, n, hd)), jnp.float32)
        rel = jnp.asarray(rng.normal(size=(nh, n, n)), jnp.float32)
        mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        scale = hd ** -0.5

        def f_ref(q, rel):
            return jnp.sum(reference_window_attention(
                q, q, q, rel, mask, scale, nw) ** 2)

        def f_geo(q, rel):
            return jnp.sum(fused_window_attention(
                q, q, q, rel, None, scale, nw, interpret=True,
                geometry=(hp, wp, ws, shift)) ** 2)

        gr = jax.grad(f_ref, argnums=(0, 1))(q, rel)
        gg = jax.grad(f_geo, argnums=(0, 1))(q, rel)
        for a, b_ in zip(gg, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-3)

    def test_gradients_match_reference(self):
        from vision_instance_seg_tpu.kernels.window_attention import (
            fused_window_attention)
        from vision_instance_seg_tpu.models.swin import (
            reference_window_attention)

        rng = np.random.default_rng(3)
        nw, nh, n, hd = 2, 2, 16, 8
        q = jnp.asarray(rng.normal(size=(nw, nh, n, hd)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(nw, nh, n, hd)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(nw, nh, n, hd)), jnp.float32)
        rel = jnp.asarray(rng.normal(size=(nh, n, n)), jnp.float32)
        scale = hd ** -0.5

        def loss_ref(q, k, v, rel):
            return jnp.sum(reference_window_attention(
                q, k, v, rel, None, scale, nw) ** 2)

        def loss_pal(q, k, v, rel):
            return jnp.sum(fused_window_attention(
                q, k, v, rel, None, scale, nw, interpret=True) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, rel)
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(q, k, v, rel)
        for a, b in zip(g_ref, g_pal):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-3)


@pytest.mark.slow
class TestWindowAttentionNHWC:
    """NHWC fused partition+attention+merge kernel vs the jnp window path."""

    def _ref(self, qkv, rel, scale, ws, shift):
        from vision_instance_seg_tpu.kernels.window_attention import (
            _wa_nhwc_jnp)
        return _wa_nhwc_jnp(qkv, rel, scale, ws, shift)

    def _run(self, b, hp, wp, nh, hd, ws, shift, seed=0):
        from vision_instance_seg_tpu.kernels.window_attention import (
            fused_window_attention_nhwc)

        c = nh * hd
        n = ws * ws
        rng = np.random.default_rng(seed)
        qkv = jnp.asarray(rng.normal(size=(b, hp, wp, 3 * c)), jnp.float32)
        rel = jnp.asarray(rng.normal(size=(nh, n, n)), jnp.float32)
        scale = hd ** -0.5
        ref = self._ref(qkv, rel, scale, ws, shift)
        got = fused_window_attention_nhwc(qkv, rel, scale,
                                          (hp, wp, ws, shift),
                                          interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_even_window_columns(self):
        self._run(b=2, hp=16, wp=16, nh=2, hd=16, ws=8, shift=0)

    def test_odd_window_columns_solo_tail(self):
        self._run(b=1, hp=16, wp=24, nh=2, hd=16, ws=8, shift=0)

    def test_shifted_regions(self):
        self._run(b=1, hp=24, wp=24, nh=3, hd=8, ws=8, shift=4)

    def test_shifted_odd_columns(self):
        self._run(b=2, hp=16, wp=24, nh=1, hd=32, ws=8, shift=4)

    def test_single_window_column(self):
        self._run(b=1, hp=16, wp=8, nh=2, hd=16, ws=8, shift=0)

    def test_gradients_match_reference(self):
        from vision_instance_seg_tpu.kernels.window_attention import (
            fused_window_attention_nhwc)

        b, hp, wp, nh, hd, ws, shift = 1, 16, 16, 2, 8, 8, 4
        c = nh * hd
        n = ws * ws
        rng = np.random.default_rng(5)
        qkv = jnp.asarray(rng.normal(size=(b, hp, wp, 3 * c)), jnp.float32)
        rel = jnp.asarray(rng.normal(size=(nh, n, n)), jnp.float32)
        scale = hd ** -0.5

        def loss_ref(qkv, rel):
            return jnp.sum(self._ref(qkv, rel, scale, ws, shift) ** 2)

        def loss_pal(qkv, rel):
            return jnp.sum(fused_window_attention_nhwc(
                qkv, rel, scale, (hp, wp, ws, shift), interpret=True) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, rel)
        g_pal = jax.grad(loss_pal, argnums=(0, 1))(qkv, rel)
        for a, b_ in zip(g_pal, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-3)


class TestSwinBlockNHWC:
    """SwinBlock with the NHWC attn_fn == plain SwinBlock, same params."""

    @pytest.mark.parametrize("shift", [0, 4])
    def test_matches_plain_block(self, shift):
        import functools as ft

        from vision_instance_seg_tpu.kernels import window_attention as wa
        from vision_instance_seg_tpu.models.swin import SwinBlock

        orig = wa.fused_window_attention_nhwc
        interp = ft.wraps(orig)(ft.partial(orig, interpret=True))
        interp.wants_nhwc = True
        kw = dict(dim=32, num_heads=2, window_size=8, shift_size=shift)
        plain = SwinBlock(**kw)
        fused = SwinBlock(attn_fn=interp, **kw)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 32)), jnp.float32)
        params = plain.init(jax.random.PRNGKey(0), x)
        ref = plain.apply(params, x)
        # same param tree drives the fused module (identical Dense names)
        got = fused.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_non_multiple_of_8_falls_back(self):
        """ws=7 + NHWC attn_fn must silently use the jnp token path."""
        from vision_instance_seg_tpu.kernels.window_attention import (
            fused_window_attention_nhwc)
        from vision_instance_seg_tpu.models.swin import SwinBlock

        kw = dict(dim=16, num_heads=2, window_size=7, shift_size=3)
        plain = SwinBlock(**kw)
        fused = SwinBlock(attn_fn=fused_window_attention_nhwc, **kw)
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(1, 14, 14, 16)), jnp.float32)
        params = plain.init(jax.random.PRNGKey(0), x)
        ref = plain.apply(params, x)
        got = fused.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
class TestWindowAttentionNHWCSplit:
    """Split-qkv NHWC kernel (window-encoder contract) vs the jnp path."""

    def _run(self, b, h, w, nh, hd, ws, shift, seed=0):
        from vision_instance_seg_tpu.kernels.window_attention import (
            _wa_nhwc_split_jnp, fused_window_attention_nhwc_split)

        c = nh * hd
        n = ws * ws
        hp, wp = -(-h // ws) * ws, -(-w // ws) * ws
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.normal(size=(b, hp, wp, c)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, hp, wp, c)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, hp, wp, c)), jnp.float32)
        rel = jnp.asarray(rng.normal(size=(nh, n, n)), jnp.float32)
        scale = hd ** -0.5
        pad = None if (hp, wp) == (h, w) else (h, w)
        ref = _wa_nhwc_split_jnp(q, k, v, rel, scale, ws, shift, pad)
        got = fused_window_attention_nhwc_split(
            q, k, v, rel, scale, (hp, wp, ws, shift), pad_hw=(h, w),
            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_no_pad_no_shift(self):
        self._run(b=2, h=16, w=16, nh=2, hd=16, ws=8, shift=0)

    def test_pad_masks_real_tokens(self):
        self._run(b=1, h=13, w=21, nh=2, hd=16, ws=8, shift=0)

    def test_pad_and_shift(self):
        self._run(b=1, h=13, w=21, nh=2, hd=16, ws=8, shift=4)

    def test_shift_no_pad(self):
        self._run(b=2, h=24, w=16, nh=3, hd=8, ws=8, shift=4)

    def test_gradients_match_reference(self):
        from vision_instance_seg_tpu.kernels.window_attention import (
            _wa_nhwc_split_jnp, fused_window_attention_nhwc_split)

        b, h, w, nh, hd, ws, shift = 1, 13, 16, 2, 8, 8, 4
        c = nh * hd
        n = ws * ws
        hp, wp = 16, 16
        rng = np.random.default_rng(11)
        q = jnp.asarray(rng.normal(size=(b, hp, wp, c)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, hp, wp, c)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, hp, wp, c)), jnp.float32)
        rel = jnp.asarray(rng.normal(size=(nh, n, n)), jnp.float32)
        scale = hd ** -0.5

        def loss_ref(q, k, v, rel):
            return jnp.sum(_wa_nhwc_split_jnp(
                q, k, v, rel, scale, ws, shift, (h, w)) ** 2)

        def loss_pal(q, k, v, rel):
            return jnp.sum(fused_window_attention_nhwc_split(
                q, k, v, rel, scale, (hp, wp, ws, shift), pad_hw=(h, w),
                interpret=True) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, rel)
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(q, k, v, rel)
        for a, b_ in zip(g_pal, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-3)


class TestWindowEncoderLayerNHWC:
    """WindowEncoderLayer with the split NHWC attn_fn == plain layer."""

    @pytest.mark.parametrize("shifted", [False, True])
    def test_matches_plain_layer(self, shifted):
        import functools as ft

        from vision_instance_seg_tpu.kernels import window_attention as wa
        from vision_instance_seg_tpu.models.pixel_decoder import (
            WindowEncoderLayer)

        orig = wa.fused_window_attention_nhwc_split
        interp = ft.wraps(orig)(ft.partial(orig, interpret=True))
        interp.wants_nhwc = True
        kw = dict(dim=32, num_heads=2, ffn_dim=64, window_size=8,
                  shift=shifted)
        plain = WindowEncoderLayer(**kw)
        fused = WindowEncoderLayer(attn_fn=interp, **kw)
        shapes = ((13, 21), (7, 11))
        s = sum(h * w for h, w in shapes)
        rng = np.random.default_rng(13)
        src = jnp.asarray(rng.normal(size=(1, s, 32)), jnp.float32)
        pos = jnp.asarray(rng.normal(size=(1, s, 32)), jnp.float32)
        params = plain.init(jax.random.PRNGKey(0), src, pos, None, shapes)
        ref = plain.apply(params, src, pos, None, shapes)
        got = fused.apply(params, src, pos, None, shapes)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
class TestWindowAttentionNHWCBwdFlavors:
    """Pallas recompute backward == jnp recompute backward, both variants."""

    def test_fused_bwd_flavors_agree(self, monkeypatch):
        from vision_instance_seg_tpu.kernels import window_attention as wa

        b, hp, wp, nh, hd, ws, shift = 1, 16, 24, 2, 8, 8, 4
        c = nh * hd
        n = ws * ws
        rng = np.random.default_rng(17)
        qkv = jnp.asarray(rng.normal(size=(b, hp, wp, 3 * c)), jnp.float32)
        rel = jnp.asarray(rng.normal(size=(nh, n, n)), jnp.float32)
        g = jnp.asarray(rng.normal(size=(b, hp, wp, c)), jnp.float32)

        pallas = wa._wa_nhwc_bwd(0.3, ws, shift, True, (qkv, rel), g)
        monkeypatch.setattr(wa, "_use_pallas_bwd", lambda interp: False)
        ref = wa._wa_nhwc_bwd(0.3, ws, shift, True, (qkv, rel), g)
        for a, b_ in zip(pallas, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-4)

    def test_split_bwd_flavors_agree(self, monkeypatch):
        from vision_instance_seg_tpu.kernels import window_attention as wa

        b, hp, wp, nh, hd, ws, shift = 2, 16, 16, 2, 8, 8, 4
        c = nh * hd
        n = ws * ws
        rng = np.random.default_rng(19)
        mk = lambda: jnp.asarray(rng.normal(size=(b, hp, wp, c)), jnp.float32)
        q, k, v = mk(), mk(), mk()
        rel = jnp.asarray(rng.normal(size=(nh, n, n)), jnp.float32)
        g = jnp.asarray(rng.normal(size=(b, hp, wp, c)), jnp.float32)

        pallas = wa._wa_nhwc_split_bwd(0.3, ws, shift, (13, 14), True,
                                       (q, k, v, rel), g)
        monkeypatch.setattr(wa, "_use_pallas_bwd", lambda interp: False)
        ref = wa._wa_nhwc_split_bwd(0.3, ws, shift, (13, 14), True,
                                    (q, k, v, rel), g)
        for a, b_ in zip(pallas, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-4)
