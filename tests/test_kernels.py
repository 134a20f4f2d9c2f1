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
