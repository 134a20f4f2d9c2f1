"""Golden tests: Pallas MSDeformAttn kernel vs the jnp reference core.

The kernel (kernels/msdeform_attn.py) replaces the reference's CUDA
MSDeformAttn op (reference training/maskdino/train_original.py:29); the
jnp core (models/deform_attn.ms_deform_attn_core_jnp) is the exactness
oracle. Tests run in Pallas interpret mode on the CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_instance_seg_tpu.kernels.msdeform_attn import (
    fused_ms_deform_attn, ms_deform_attn_encoder_pallas)
from vision_instance_seg_tpu.models.deform_attn import ms_deform_attn_core_jnp

SHAPES = [(8, 8), (4, 4), (2, 2)]
B, NH, HD, P = 2, 2, 8, 3


def _inputs(seed, shapes=SHAPES, offset_px=2.0, b=B, nh=NH, hd=HD, p=P):
    """Encoder-style inputs: queries = the multi-scale grid; sampling
    locations = own pixel center + per-level-pixel offsets <= offset_px."""
    rng = np.random.default_rng(seed)
    nl = len(shapes)
    q = sum(h * w for h, w in shapes)
    value = rng.standard_normal((b, q, nh, hd)).astype(np.float32)

    refs = []
    for (h, w) in shapes:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)                       # (Q, 2)
    ref = np.tile(ref[None, :, None, None, None, :], (b, 1, nh, nl, p, 1))

    off = rng.uniform(-offset_px, offset_px,
                      (b, q, nh, nl, p, 2)).astype(np.float32)
    wh = np.array([[w, h] for h, w in shapes], np.float32)
    loc = ref + off / wh[None, None, None, :, None, :]

    aw = rng.standard_normal((b, q, nh, nl * p)).astype(np.float32)
    aw = jax.nn.softmax(jnp.asarray(aw), -1).reshape(b, q, nh, nl, p)
    return jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw)


def test_encoder_kernel_matches_jnp_core():
    value, loc, aw = _inputs(0)
    want = ms_deform_attn_core_jnp(value, SHAPES, loc, aw)
    got = ms_deform_attn_encoder_pallas(value, SHAPES, loc, aw,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_encoder_kernel_zero_outside_map():
    """Samples pushed off the feature map must contribute exactly zero
    (CUDA-kernel convention), not edge-clamped values."""
    value, loc, aw = _inputs(1, offset_px=0.0)
    # push every level-0 sample of the first 4 queries far off the map
    loc = loc.at[:, :4, :, 0, :, 0].set(-0.9)
    want = ms_deform_attn_core_jnp(value, SHAPES, loc, aw)
    got = ms_deform_attn_encoder_pallas(value, SHAPES, loc, aw,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_encoder_kernel_ragged_levels():
    """Non-square, non-divisible levels exercise partial tiles."""
    shapes = [(10, 6), (5, 3), (3, 2)]
    value, loc, aw = _inputs(2, shapes=shapes)
    want = ms_deform_attn_core_jnp(value, shapes, loc, aw)
    got = ms_deform_attn_encoder_pallas(value, shapes, loc, aw,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_encoder_kernel_4level():
    """4-scale layout (MaskDINO 4s: extra stride-64 level, 13x13-ish)."""
    shapes = [(3, 3), (8, 8), (4, 4), (2, 2)]
    value, loc, aw = _inputs(3, shapes=shapes)
    want = ms_deform_attn_core_jnp(value, shapes, loc, aw)
    got = ms_deform_attn_encoder_pallas(value, shapes, loc, aw,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dispatch_falls_back_for_free_queries():
    """Non-grid queries (decoder) route to the one-hot core on any
    backend; it must match the jnp gather core (different f32 summation
    order -> float-epsilon tolerance)."""
    value, loc, aw = _inputs(4)
    loc, aw = loc[:, :5], aw[:, :5]                    # 5 free queries
    got = fused_ms_deform_attn(value, SHAPES, loc, aw)
    want = ms_deform_attn_core_jnp(value, SHAPES, loc, aw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_hybrid_dispatch_reassembles_level_order(monkeypatch):
    """The TPU hybrid dispatch (fine query levels -> Pallas, levels of
    <= ONEHOT_QMAX tokens -> one-hot core) must reassemble the per-level
    outputs in the ORIGINAL level order. Forced onto the CPU backend by
    monkeypatching the backend check and routing the Pallas branch through
    interpret mode — an interleave bug here would silently corrupt every
    4-scale TPU forward."""
    from vision_instance_seg_tpu.kernels import msdeform_attn as K

    value, loc, aw = _inputs(5)
    want = ms_deform_attn_core_jnp(value, SHAPES, loc, aw)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # splits are 64/16/4: QMAX 8 -> fine = levels 0,1; coarse = level 2
    monkeypatch.setattr(K, "ONEHOT_QMAX", 8)
    calls = []

    def fake_pallas_diff(v, shapes, query_levels, l, a):
        calls.append(tuple(query_levels))
        return K.ms_deform_attn_encoder_pallas(
            v, shapes, l, a, interpret=True, query_levels=query_levels)

    monkeypatch.setattr(K, "_encoder_pallas_diff", fake_pallas_diff)
    got = K.fused_ms_deform_attn(value, SHAPES, loc, aw)
    assert calls == [(0, 1)]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # all levels coarse -> pure one-hot core, still exact
    monkeypatch.setattr(K, "ONEHOT_QMAX", 64)
    calls.clear()
    got2 = K.fused_ms_deform_attn(value, SHAPES, loc, aw)
    assert calls == []
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_onehot_core_matches_jnp_arbitrary_offsets():
    """The one-hot free-query core is exact for ARBITRARY offsets — wide
    (beyond any halo), out-of-map, and off-grid — and its XLA gradient
    matches the jnp core's VJP."""
    from vision_instance_seg_tpu.models.deform_attn import (
        ms_deform_attn_core_onehot)

    value, loc, aw = _inputs(6, offset_px=7.0)         # way past halo 6
    loc, aw = loc[:, 7:19], aw[:, 7:19]                # 12 free queries
    # push some samples fully off-map on both sides
    loc = loc.at[:, :2, :, 0, :, 0].set(-0.7)
    loc = loc.at[:, 2:4, :, 1, :, 1].set(1.8)
    want = ms_deform_attn_core_jnp(value, SHAPES, loc, aw)
    got = ms_deform_attn_core_onehot(value, SHAPES, loc, aw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss_onehot(v, l, a):
        return jnp.sum(ms_deform_attn_core_onehot(v, SHAPES, l, a) ** 2)

    def loss_jnp(v, l, a):
        return jnp.sum(ms_deform_attn_core_jnp(v, SHAPES, l, a) ** 2)

    g1 = jax.grad(loss_onehot, argnums=(0, 1, 2))(value, loc, aw)
    g2 = jax.grad(loss_jnp, argnums=(0, 1, 2))(value, loc, aw)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_custom_vjp_bwd_rule_uses_blocked_kernels():
    """The custom_vjp backward rule routes to the blocked Pallas backward
    (ms_deform_attn_encoder_bwd_pallas); its correctness is pinned by
    test_blocked_backward_matches_jnp_vjp."""
    from vision_instance_seg_tpu.kernels import msdeform_attn as K

    calls = []
    orig = K.ms_deform_attn_encoder_bwd_pallas
    value, loc, aw = _inputs(5)
    g = jnp.zeros((value.shape[0], value.shape[1], NH * HD), jnp.float32)
    try:
        K.ms_deform_attn_encoder_bwd_pallas = \
            lambda *a, **k: calls.append(1) or orig(*a, interpret=True, **k)
        out = K._encoder_pallas_bwd(tuple(map(tuple, SHAPES)), None,
                                    (value, loc, aw), g)
    finally:
        K.ms_deform_attn_encoder_bwd_pallas = orig
    assert calls and len(out) == 3
    assert out[0].shape == value.shape


@pytest.mark.slow
@pytest.mark.parametrize("shapes", [SHAPES, [(10, 6), (5, 3), (3, 2)],
                                    [(3, 3), (8, 8), (4, 4), (2, 2)]])
def test_blocked_backward_matches_jnp_vjp(shapes):
    """The blocked Pallas backward (query-centric dloc/daw + value-centric
    dValue) must reproduce jax.vjp of the jnp core exactly (within f32
    tolerance) for in-contract offsets."""
    from vision_instance_seg_tpu.kernels.msdeform_attn import (
        ms_deform_attn_encoder_bwd_pallas)

    value, loc, aw = _inputs(11, shapes=shapes)
    rng = np.random.default_rng(12)
    q = sum(h * w for h, w in shapes)
    g = jnp.asarray(rng.standard_normal(
        (value.shape[0], q, NH * HD)).astype(np.float32))
    got = ms_deform_attn_encoder_bwd_pallas(value, shapes, loc, aw, g,
                                            interpret=True)
    _, vjp = jax.vjp(
        lambda v, l, w: ms_deform_attn_core_jnp(v, shapes, l, w),
        value, loc, aw)
    want = vjp(g)
    for name, a, b in zip(("d_value", "d_loc", "d_aw"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_encoder_kernel_query_level_subset():
    """``query_levels`` restricts the kernel to a subset of query levels
    (the 4-scale hybrid dispatch routes coarse levels to the one-hot
    core): outputs must equal the jnp core's slices for those levels."""
    value, loc, aw = _inputs(40)
    splits = [h * w for h, w in SHAPES]
    offs = np.cumsum([0] + splits)
    want_full = ms_deform_attn_core_jnp(value, SHAPES, loc, aw)
    qlv = (0, 2)
    take = lambda a: jnp.concatenate(
        [a[:, offs[i]:offs[i + 1]] for i in qlv], axis=1)
    got = ms_deform_attn_encoder_pallas(value, SHAPES, take(loc), take(aw),
                                        interpret=True, query_levels=qlv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(take(want_full)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_blocked_backward_query_level_subset():
    """Subset backward == jnp-core VJP restricted to the subset queries
    (zero cotangent on the one-hot-routed levels)."""
    from vision_instance_seg_tpu.kernels.msdeform_attn import (
        ms_deform_attn_encoder_bwd_pallas)

    shapes = [(3, 3), (8, 8), (4, 4), (2, 2)]
    qlv = (1, 2)
    value, loc, aw = _inputs(41, shapes=shapes)
    splits = [h * w for h, w in shapes]
    offs = np.cumsum([0] + splits)
    take = lambda a: jnp.concatenate(
        [a[:, offs[i]:offs[i + 1]] for i in qlv], axis=1)
    rng = np.random.default_rng(42)
    gq = jnp.asarray(rng.standard_normal(
        (value.shape[0], sum(splits[i] for i in qlv),
         NH * HD)).astype(np.float32))
    got = ms_deform_attn_encoder_bwd_pallas(
        value, shapes, take(loc), take(aw), gq, interpret=True,
        query_levels=qlv)
    # oracle: full-query jnp VJP with the cotangent zeroed outside qlv
    g_full = jnp.zeros((value.shape[0], sum(splits), NH * HD), jnp.float32)
    for k, i in enumerate(qlv):
        kof = np.cumsum([0] + [splits[j] for j in qlv])
        g_full = g_full.at[:, offs[i]:offs[i + 1]].set(
            gq[:, kof[k]:kof[k + 1]])
    _, vjp = jax.vjp(
        lambda v, l, w: ms_deform_attn_core_jnp(v, shapes, l, w),
        value, loc, aw)
    dv, dl, dw = vjp(g_full)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(dv),
                               rtol=2e-4, atol=2e-4, err_msg="d_value")
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(take(dl)),
                               rtol=2e-4, atol=2e-4, err_msg="d_loc")
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(take(dw)),
                               rtol=2e-4, atol=2e-4, err_msg="d_aw")


@pytest.mark.slow
def test_halo_deviation_and_module_clamp():
    """Halo contract (VERDICT r2 weak #4): quantify the kernel-vs-jnp
    deviation for offsets BEYOND the halo, and pin that the module-level
    offset clamp (MSDeformAttn.offset_clamp <- fused_ms_deform_attn
    .offset_clamp) restores exact agreement: kernel == jnp core on the
    clamped locations, for arbitrarily wide offsets."""
    from vision_instance_seg_tpu.kernels.msdeform_attn import DEFAULT_HALO

    assert fused_ms_deform_attn.offset_clamp == float(DEFAULT_HALO)

    # the finest level must EXCEED the halo-window extent (tile span +
    # 2*halo + 2, W rounded to 8) or the windows cover the whole level and
    # the kernel stays exact for any offset (which is what the smaller
    # golden shapes exercise)
    shapes = [(32, 56), (16, 28), (8, 14)]
    # offsets up to 20 px of the sampled level -- far beyond halo=6
    value, loc_wide, aw = _inputs(21, shapes=shapes, offset_px=20.0, b=1)
    want_wide = ms_deform_attn_encoder_pallas(value, shapes, loc_wide, aw,
                                              interpret=True)
    ref_wide = ms_deform_attn_core_jnp(value, shapes, loc_wide, aw)
    dev = float(jnp.max(jnp.abs(want_wide - ref_wide)))
    # beyond-halo samples clamp to the window edge: the deviation is real
    # (nonzero) but bounded by the attention-weighted value magnitude
    assert dev > 1e-4, "expected a measurable beyond-halo deviation"
    assert dev < float(jnp.max(jnp.abs(value))) * 2.0

    # module-level clamp: clamp offsets to +-halo px, then kernel == core
    refs = []
    for (h, w) in shapes:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)
    nl, p = len(shapes), loc_wide.shape[-2]
    ref = jnp.asarray(np.tile(ref[None, :, None, None, None, :],
                              (value.shape[0], 1, NH, nl, p, 1)))
    wh = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)
    off_px = (loc_wide - ref) * wh[None, None, None, :, None, :]
    off_px = jnp.clip(off_px, -float(DEFAULT_HALO), float(DEFAULT_HALO))
    loc_clamped = ref + off_px / wh[None, None, None, :, None, :]

    got = ms_deform_attn_encoder_pallas(value, shapes, loc_clamped, aw,
                                        interpret=True)
    want = ms_deform_attn_core_jnp(value, shapes, loc_clamped, aw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_msdeformattn_module_applies_clamp():
    """MSDeformAttn with the fused core must produce the same output as an
    explicitly-clamped jnp-core run (the clamp is read off the core_fn)."""
    from vision_instance_seg_tpu.models.deform_attn import MSDeformAttn

    shapes = [(6, 6), (3, 3)]
    q = sum(h * w for h, w in shapes)
    c, nh, p = 16, 2, 2
    rng = np.random.default_rng(31)
    query = jnp.asarray(rng.standard_normal((1, q, c)).astype(np.float32))
    value = jnp.asarray(rng.standard_normal((1, q, c)).astype(np.float32))
    refs = []
    for (h, w) in shapes:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = jnp.asarray(np.concatenate(refs, 0))[None, :, None, :]
    ref = jnp.broadcast_to(ref, (1, q, len(shapes), 2))

    mod_fused = MSDeformAttn(c, nh, len(shapes), p,
                             core_fn=fused_ms_deform_attn)
    params = mod_fused.init(jax.random.key(0), query, ref, value, shapes)
    # seed huge offset biases so raw offsets far exceed the halo
    so = np.asarray(params["params"]["sampling_offsets"]["bias"])
    so = so + np.where(np.arange(so.size) % 2 == 0, 40.0, -40.0)
    params2 = jax.device_get(params)
    params2["params"]["sampling_offsets"]["bias"] = jnp.asarray(so)

    out_fused = mod_fused.apply(params2, query, ref, value, shapes)
    mod_clamped = MSDeformAttn(c, nh, len(shapes), p, core_fn=None,
                               offset_clamp=fused_ms_deform_attn.offset_clamp)
    out_ref = mod_clamped.apply(params2, query, ref, value, shapes)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["outer", "compare"])
def test_selection_build_modes_forward(monkeypatch, mode):
    """Both selection-matrix builds — the factorized two-hot outer-product
    (VIST_MSDEFORM_ONEHOT=outer, the default) and the legacy per-corner
    iota-compare (=compare) — must match the jnp core exactly, so the env
    escape hatch never rots."""
    from vision_instance_seg_tpu.kernels import msdeform_attn as K

    monkeypatch.setattr(K, "ONEHOT_MODE", mode)
    value, loc, aw = _inputs(77)
    want = ms_deform_attn_core_jnp(value, SHAPES, loc, aw)
    got = K.ms_deform_attn_encoder_pallas(value, SHAPES, loc, aw,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["outer", "compare"])
def test_selection_build_modes_backward(monkeypatch, mode):
    """Blocked backward parity with the jnp VJP under BOTH selection
    builds (the windowed fine-level dvalue kernel gained the factorized
    build last; this pins the compare fallback too)."""
    from vision_instance_seg_tpu.kernels import msdeform_attn as K

    monkeypatch.setattr(K, "ONEHOT_MODE", mode)
    shapes = [(8, 8), (4, 4), (2, 2)]
    value, loc, aw = _inputs(78, shapes=shapes)
    rng = np.random.default_rng(79)
    q = sum(h * w for h, w in shapes)
    g = jnp.asarray(rng.standard_normal(
        (value.shape[0], q, NH * HD)).astype(np.float32))
    got = K.ms_deform_attn_encoder_bwd_pallas(value, shapes, loc, aw, g,
                                              interpret=True)
    _, vjp = jax.vjp(
        lambda v, l, w: ms_deform_attn_core_jnp(v, shapes, l, w),
        value, loc, aw)
    want = vjp(g)
    for name, a, b in zip(("d_value", "d_loc", "d_aw"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_hybrid_qmax_refused_without_explicit_allow():
    """VIST_MSDEFORM_ONEHOT_QMAX>0 (the hybrid dispatch that
    deterministically crashes the TPU worker inside the full model —
    docs/PERF.md repro) must refuse to run unless VIST_ALLOW_HYBRID=1
    is also set (VERDICT r4 #7)."""
    import os
    import subprocess
    import sys

    code = "import vision_instance_seg_tpu.kernels.msdeform_attn"
    env = dict(os.environ, VIST_MSDEFORM_ONEHOT_QMAX="256",
               JAX_PLATFORMS="cpu")
    env.pop("VIST_ALLOW_HYBRID", None)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode != 0
    assert "VIST_ALLOW_HYBRID" in r.stderr
    r2 = subprocess.run([sys.executable, "-c", code],
                        env=dict(env, VIST_ALLOW_HYBRID="1"),
                        capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr
