"""Model-stack tests: shapes, jit, numerics, matcher, criterion, train step.

Strategy per SURVEY.md §4: numeric golden tests of kernels vs pure-jnp
references; a tiny fixed-seed model exercising the full train/eval path on
the CPU backend (8 virtual devices via conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_instance_seg_tpu.config import get_cfg


def tiny_cfg():
    cfg = get_cfg()
    cfg.MODEL.SWIN.EMBED_DIM = 32
    cfg.MODEL.SWIN.DEPTHS = [1, 1, 1, 1]
    cfg.MODEL.SWIN.NUM_HEADS = [2, 2, 2, 2]
    cfg.MODEL.SWIN.DROP_PATH_RATE = 0.0
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    cfg.MODEL.SEM_SEG_HEAD.MASK_DIM = 32
    cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = 1
    cfg.MODEL.MASK_FORMER.HIDDEN_DIM = 32
    cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES = 8
    cfg.MODEL.MASK_FORMER.DIM_FEEDFORWARD = 64
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = 4
    cfg.MODEL.MASK_FORMER.TRAIN_NUM_POINTS = 256
    cfg.MODEL.MASK_FORMER.NHEADS = 4
    cfg.INPUT.IMAGE_SIZE = 64
    cfg.INPUT.MAX_INSTANCES = 4
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.TPU.USE_PALLAS_WINDOW_ATTN = False
    cfg.TPU.USE_PALLAS_DEFORM_ATTN = False
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


@pytest.fixture(scope="module")
def tiny_model():
    from vision_instance_seg_tpu.models import build_model, normalize_image

    cfg = tiny_cfg()
    model = build_model(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.key(0), normalize_image(x, cfg))
    return cfg, model, params


class TestSwin:
    def test_feature_strides(self):
        from vision_instance_seg_tpu.models.swin import SwinTransformer

        m = SwinTransformer(embed_dim=32, depths=(1, 1, 1, 1),
                            num_heads=(2, 2, 2, 2), drop_path_rate=0.0)
        x = jnp.zeros((1, 64, 96, 3))
        params = jax.jit(m.init)(jax.random.key(0), x)
        out = m.apply(params, x)
        assert out["res2"].shape == (1, 16, 24, 32)
        assert out["res3"].shape == (1, 8, 12, 64)
        assert out["res4"].shape == (1, 4, 6, 128)
        assert out["res5"].shape == (1, 2, 3, 256)

    def test_transpose_free_attention_matches_reference(self):
        """WindowAttention's default (attn_fn=None) transpose-free path
        must match the explicit reference_window_attention path (same
        params, f32; reduction order differs by layout so tolerance is
        float-epsilon, not zero)."""
        from vision_instance_seg_tpu.models.swin import (
            WindowAttention, _shift_attn_mask, reference_window_attention)

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((8, 49, 32)), jnp.float32)
        mask = jnp.asarray(_shift_attn_mask(14, 14, 7, 3))
        fast = WindowAttention(32, 4, 7)
        slow = WindowAttention(32, 4, 7,
                               attn_fn=reference_window_attention)
        params = fast.init(jax.random.key(0), x, mask, 4)
        np.testing.assert_allclose(
            np.asarray(fast.apply(params, x, mask, 4)),
            np.asarray(slow.apply(params, x, mask, 4)),
            atol=1e-7, rtol=1e-4)

    def test_window_partition_roundtrip(self):
        from vision_instance_seg_tpu.models.swin import (
            window_partition, window_unpartition)

        x = jnp.arange(2 * 14 * 14 * 3, dtype=jnp.float32).reshape(2, 14, 14, 3)
        w = window_partition(x, 7)
        assert w.shape == (2 * 4, 49, 3)
        np.testing.assert_array_equal(window_unpartition(w, 7, 14, 14), x)


class TestResNet:
    def test_shapes(self):
        from vision_instance_seg_tpu.models.resnet import ResNet

        m = ResNet(depth=50)
        x = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(m.init)(jax.random.key(0), x)
        out = m.apply(variables, x)
        assert out["res2"].shape == (1, 16, 16, 256)
        assert out["res5"].shape == (1, 2, 2, 2048)


class TestDeformAttnCore:
    def test_center_sample_identity(self):
        """Sampling exactly at pixel centers returns the pixel values."""
        from vision_instance_seg_tpu.models.deform_attn import (
            ms_deform_attn_core_jnp)

        h = w = 4
        v = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h * w, 1, 1)
        # one query per pixel, weight 1 on a single point at that pixel center
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        locs = np.stack([(xs.ravel() + 0.5) / w, (ys.ravel() + 0.5) / h], -1)
        loc = jnp.asarray(locs).reshape(1, h * w, 1, 1, 1, 2)
        wgt = jnp.ones((1, h * w, 1, 1, 1))
        out = ms_deform_attn_core_jnp(v, [(h, w)], loc, wgt)
        np.testing.assert_allclose(
            np.asarray(out).ravel(), np.arange(h * w, dtype=np.float32),
            rtol=1e-5)

    def test_out_of_range_zero(self):
        from vision_instance_seg_tpu.models.deform_attn import (
            ms_deform_attn_core_jnp)

        v = jnp.ones((1, 16, 1, 2))
        loc = jnp.full((1, 1, 1, 1, 1, 2), 5.0)   # far outside [0,1]
        wgt = jnp.ones((1, 1, 1, 1, 1))
        out = ms_deform_attn_core_jnp(v, [(4, 4)], loc, wgt)
        np.testing.assert_allclose(np.asarray(out), 0.0)


class TestMatcher:
    def test_matches_scipy(self):
        """Device Hungarian == scipy linear_sum_assignment on random costs."""
        from scipy.optimize import linear_sum_assignment

        import optax

        rng = np.random.default_rng(0)
        for _ in range(5):
            cost = rng.random((6, 10))
            i, j = optax.assignment.hungarian_algorithm(jnp.asarray(cost))
            si, sj = linear_sum_assignment(cost)
            total = cost[np.asarray(i), np.asarray(j)].sum()
            assert np.isclose(total, cost[si, sj].sum())

    def test_padded_invalid_dropped(self):
        from vision_instance_seg_tpu.models.matcher import hungarian_match

        b, q, m, p = 1, 4, 3, 8
        key = jax.random.key(0)
        cls_logits = jax.random.normal(key, (b, q, 2))
        gt_classes = jnp.zeros((b, m), jnp.int32)
        gt_pts = jax.random.bernoulli(key, 0.5, (b, m, p)).astype(jnp.float32)
        pr_pts = jax.random.normal(key, (b, q, p))
        valid = jnp.asarray([[True, True, False]])
        res = hungarian_match(cls_logits, None, gt_classes, gt_pts, pr_pts,
                              valid)
        # the two valid GTs get distinct queries
        q0, q1 = int(res.gt_to_query[0, 0]), int(res.gt_to_query[0, 1])
        assert q0 != q1


class TestCriterion:
    def test_perfect_prediction_low_loss(self):
        """A prediction matching GT exactly has a much lower loss than noise."""
        from vision_instance_seg_tpu.models.criterion import (
            CriterionConfig, set_criterion)

        cc = CriterionConfig(num_classes=1, num_points=128,
                             deep_supervision=False)
        b, q, m, hm, hw = 1, 4, 2, 16, 32
        key = jax.random.key(1)
        gt_masks = np.zeros((b, m, hw, hw), np.float32)
        gt_masks[0, 0, :16, :16] = 1
        gt_masks[0, 1, 16:, 16:] = 1
        gt_classes = jnp.zeros((b, m), jnp.int32)
        gt_valid = jnp.ones((b, m), bool)

        # "perfect": two queries carry the GT masks at high confidence
        mask_logits = np.full((1, b, q, hm, hm), -20.0, np.float32)
        mask_logits[0, 0, 0, :8, :8] = 20.0
        mask_logits[0, 0, 1, 8:, 8:] = 20.0
        cls_logits = np.zeros((1, b, q, 2), np.float32)
        cls_logits[..., 1] = 10.0                  # default: no-object
        cls_logits[0, 0, 0] = [10.0, 0.0]
        cls_logits[0, 0, 1] = [10.0, 0.0]

        good, _ = set_criterion(key, jnp.asarray(cls_logits),
                                jnp.asarray(mask_logits), gt_classes,
                                jnp.asarray(gt_masks), gt_valid, cc)
        bad_masks = jax.random.normal(key, (1, b, q, hm, hm))
        bad_cls = jax.random.normal(key, (1, b, q, 2))
        bad, _ = set_criterion(key, bad_cls, bad_masks, gt_classes,
                               jnp.asarray(gt_masks), gt_valid, cc)
        assert float(good) < float(bad) * 0.5

    def test_no_gt_only_ce(self):
        from vision_instance_seg_tpu.models.criterion import (
            CriterionConfig, set_criterion)

        cc = CriterionConfig(num_points=64, deep_supervision=False)
        key = jax.random.key(0)
        loss, logs = set_criterion(
            key, jnp.zeros((1, 1, 4, 2)), jnp.zeros((1, 1, 4, 8, 8)),
            jnp.zeros((1, 2), jnp.int32), jnp.zeros((1, 2, 16, 16)),
            jnp.zeros((1, 2), bool), cc)
        assert np.isfinite(float(loss))


@pytest.mark.slow
class TestFullAttentionEncoder:
    def test_forward_matches_shapes(self):
        """ENCODER_ATTENTION=full produces the same output structure."""
        from vision_instance_seg_tpu.models import build_model, normalize_image

        cfg = tiny_cfg()
        cfg.MODEL.SEM_SEG_HEAD.ENCODER_ATTENTION = "full"
        model = build_model(cfg)
        x = jnp.zeros((1, 64, 64, 3))
        params = jax.jit(model.init)(jax.random.key(0),
                                     normalize_image(x, cfg))
        cls, masks = model.apply(params, x)
        assert cls.shape[-2:] == (8, 2)
        assert masks.shape[-2:] == (16, 16)
        assert np.isfinite(np.asarray(cls)).all()


class TestScannedDeformableEncoder:
    def test_scan_matches_loop(self):
        """nn.scan-folded encoder == the per-layer Python loop.

        The scan layout stacks per-layer params along axis 0
        (encoder_layers/layer/...); stacking the loop layout's
        encoder_layer{i} subtrees must reproduce the loop output exactly
        (same ops, one trace) — this also locks the layout contract the
        d2 import restack (utils/weights._restack_scanned_encoder) and
        the 3-D TP sharding rule (parallel/mesh.param_shardings) rely on.
        """
        from vision_instance_seg_tpu.models.pixel_decoder import (
            MSDeformAttnPixelDecoder)

        kw = dict(conv_dim=32, mask_dim=32,
                  transformer_in_features=("res3", "res4", "res5"),
                  num_encoder_layers=2, num_heads=4, ffn_dim=64,
                  total_num_feature_levels=4)
        rng = jax.random.key(0)
        feats = {
            n: jax.random.normal(jax.random.fold_in(rng, i),
                                 (1, 32 >> i, 32 >> i, 8))
            for i, n in enumerate(["res2", "res3", "res4", "res5"])}

        loop = MSDeformAttnPixelDecoder(scan_layers=False, **kw)
        p_loop = loop.init(jax.random.key(1), feats)
        mask_l, outs_l = loop.apply(p_loop, feats)

        scan = MSDeformAttnPixelDecoder(scan_layers=True, **kw)
        p_scan = scan.init(jax.random.key(2), feats)
        stacked = p_scan["params"]["encoder_layers"]["layer"]
        assert jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda x: x.shape[0] == 2, stacked))

        params = dict(p_loop["params"])
        layers = [params.pop(f"encoder_layer{i}") for i in range(2)]
        params["encoder_layers"] = {"layer": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, 0), *layers)}
        mask_s, outs_s = scan.apply({"params": params}, feats)

        np.testing.assert_allclose(np.asarray(mask_s), np.asarray(mask_l),
                                   rtol=1e-5, atol=1e-5)
        for a, b in zip(outs_s, outs_l):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


class TestWindowEncoder:
    def test_forward_matches_shapes(self):
        """ENCODER_ATTENTION=window produces the same output structure."""
        from vision_instance_seg_tpu.models import build_model, normalize_image

        cfg = tiny_cfg()
        cfg.MODEL.SEM_SEG_HEAD.ENCODER_ATTENTION = "window"
        cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = 2  # W-MSA + SW-MSA
        model = build_model(cfg)
        x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3)) * 30 + 100
        params = jax.jit(model.init)(jax.random.key(0),
                                     normalize_image(x, cfg))
        cls, masks = model.apply(params, normalize_image(x, cfg))
        assert cls.shape[-2:] == (8, 2)
        assert masks.shape[-2:] == (16, 16)
        assert np.isfinite(np.asarray(cls)).all()
        assert np.isfinite(np.asarray(masks)).all()

    def test_pad_shift_mask_blocks_pads(self):
        from vision_instance_seg_tpu.models.pixel_decoder import (
            _window_pad_shift_mask)

        # 5x5 level, ws=4 -> padded to 8x8, 4 windows; window 0 is all-real
        m = _window_pad_shift_mask(5, 5, 4, 0)
        assert m.shape == (4, 16, 16)
        assert (m[0] == 0).all()
        # window 1 (cols 4-7): cols 5-7 are pad -> real col 4 must not see
        # padded neighbours and vice versa
        w1 = m[1].reshape(16, 16)
        real = [r * 4 + 0 for r in range(4)]   # local col 0 = global col 4
        for i in real:
            for j in range(16):
                expect = 0.0 if j in real else -100.0
                assert w1[i, j] == expect

    def test_shifted_mask_matches_roll_semantics(self):
        from vision_instance_seg_tpu.models.pixel_decoder import (
            _window_pad_shift_mask)

        m = _window_pad_shift_mask(8, 8, 4, 2)
        assert m.shape == (4, 16, 16)
        # shifted windows mix pre-shift regions -> some pairs masked
        assert (m == -100.0).any()
        # unmasked diagonal everywhere (a token always attends to itself)
        for wi in range(4):
            assert (np.diag(m[wi]) == 0).all()


def tiny_dino_cfg():
    cfg = tiny_cfg()
    cfg.MODEL.MASK_DINO.ENABLED = True
    cfg.MODEL.MASK_DINO.DN_NUM = 8       # 2 groups x 2 x MAX_INSTANCES(4)
    return cfg


@pytest.mark.slow
class TestGreedyMatcherAndGridSampling:
    def test_greedy_valid_and_optimal_on_dominant_costs(self):
        from vision_instance_seg_tpu.models.matcher import greedy_assign
        import optax

        rng = np.random.default_rng(0)
        for _ in range(5):
            # diagonal-dominant: greedy must equal the exact solution
            cost = rng.uniform(1.0, 2.0, (6, 20)).astype(np.float32)
            cost[np.arange(6), np.arange(6)] = 0.0
            i, j = jax.jit(greedy_assign)(jnp.asarray(cost))
            hi, hj = optax.assignment.hungarian_algorithm(jnp.asarray(cost))
            got = {(int(a), int(b)) for a, b in zip(i, j)}
            want = {(int(a), int(b)) for a, b in zip(hi, hj)}
            assert got == want

    def test_greedy_assignment_is_valid_on_random_costs(self):
        from vision_instance_seg_tpu.models.matcher import greedy_assign
        import optax

        rng = np.random.default_rng(1)
        cost = rng.normal(size=(8, 25)).astype(np.float32)
        i, j = greedy_assign(jnp.asarray(cost))
        assert len(set(np.asarray(j).tolist())) == 8   # distinct columns
        greedy_total = float(cost[np.asarray(i), np.asarray(j)].sum())
        hi, hj = optax.assignment.hungarian_algorithm(jnp.asarray(cost))
        opt_total = float(cost[np.asarray(hi), np.asarray(hj)].sum())
        assert greedy_total >= opt_total - 1e-5
        assert greedy_total <= opt_total + 0.25 * abs(opt_total) + 2.0

    def test_grid_sample_masks_matches_point_sample_on_smooth_mask(self):
        from vision_instance_seg_tpu.models.matcher import grid_sample_masks

        m = np.zeros((1, 1, 64, 64), np.float32)
        m[:, :, 16:48, 16:48] = 1.0
        out = grid_sample_masks(jnp.asarray(m), 256)   # 16x16 grid
        assert out.shape == (1, 1, 256)
        frac = float(out.mean())
        assert abs(frac - 0.25) < 0.05                 # mask covers 1/4

    def test_train_step_improves_loss_fast_criterion(self):
        from vision_instance_seg_tpu.engine.solver import make_optimizer
        from vision_instance_seg_tpu.engine.trainer import (
            TrainState, make_train_step)
        from vision_instance_seg_tpu.models import build_model, normalize_image

        cfg = tiny_cfg()
        cfg.SOLVER.IMS_PER_BATCH = 1
        cfg.SOLVER.BASE_LR = 1e-3
        cfg.SOLVER.WARMUP_ITERS = 0
        cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
        cfg.MODEL.MASK_FORMER.MATCHER = "greedy"
        cfg.MODEL.MASK_FORMER.POINT_MODE = "grid"
        model = build_model(cfg)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.float32)
        masks = np.zeros((1, 4, 64, 64), np.uint8)
        masks[:, 0, 8:32, 8:32] = 1
        batch = {"image": jnp.asarray(img),
                 "gt_classes": jnp.zeros((1, 4), jnp.int32),
                 "gt_masks": jnp.asarray(masks),
                 "num_instances": jnp.ones((1,), jnp.int32)}
        params = jax.jit(model.init)(
            jax.random.key(0), normalize_image(batch["image"], cfg))
        tx = make_optimizer(cfg, params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(params))
        step = make_train_step(cfg, model, tx)
        key = jax.random.key(0)
        first = None
        for _ in range(8):
            state, logs = step(state, batch, key)
            if first is None:
                first = float(logs["loss_total"])
        last = float(logs["loss_total"])
        assert np.isfinite([first, last]).all()
        assert last < first


@pytest.mark.slow
class TestRemat:
    def test_train_step_with_remat_matches_no_remat_loss(self):
        """SWIN.USE_CHECKPOINT + TPU.REMAT_ENCODER change memory, not math."""
        from vision_instance_seg_tpu.engine.solver import make_optimizer
        from vision_instance_seg_tpu.engine.trainer import (
            TrainState, make_train_step)
        from vision_instance_seg_tpu.models import build_model, normalize_image

        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.float32)
        masks = np.zeros((1, 4, 64, 64), np.uint8)
        masks[:, 0, 8:32, 8:32] = 1
        batch = {"image": jnp.asarray(img),
                 "gt_classes": jnp.zeros((1, 4), jnp.int32),
                 "gt_masks": jnp.asarray(masks),
                 "num_instances": jnp.ones((1,), jnp.int32)}
        losses = []
        for remat in (False, True):
            cfg = tiny_cfg()
            cfg.SOLVER.IMS_PER_BATCH = 1
            cfg.MODEL.SEM_SEG_HEAD.ENCODER_ATTENTION = "window"
            cfg.MODEL.SWIN.USE_CHECKPOINT = remat
            cfg.TPU.REMAT_ENCODER = remat
            model = build_model(cfg)
            params = jax.jit(model.init)(
                jax.random.key(0), normalize_image(batch["image"], cfg))
            tx = make_optimizer(cfg, params)
            state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                               opt_state=tx.init(params))
            step = make_train_step(cfg, model, tx)
            _, logs = step(state, batch, jax.random.key(0))
            losses.append(float(logs["loss_total"]))
        assert np.isfinite(losses).all()
        np.testing.assert_allclose(losses[0], losses[1], rtol=1e-4)


@pytest.mark.slow
class TestMaskDINODenseCrossAttn:
    def test_forward_matches_shapes(self):
        from vision_instance_seg_tpu.models import build_model, normalize_image

        cfg = tiny_dino_cfg()
        cfg.MODEL.MASK_DINO.CROSS_ATTENTION = "dense"
        model = build_model(cfg)
        x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3)) * 30 + 100
        params = jax.jit(model.init)(jax.random.key(0),
                                     normalize_image(x, cfg))
        out = model.apply(params, normalize_image(x, cfg))
        assert out["pred_logits"].shape[-2:] == (8, 1)
        assert np.isfinite(np.asarray(out["pred_logits"])).all()
        assert np.isfinite(np.asarray(out["pred_masks"])).all()


@pytest.fixture(scope="module")
def tiny_dino_model():
    from vision_instance_seg_tpu.models import build_model, normalize_image

    cfg = tiny_dino_cfg()
    model = build_model(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.key(0), normalize_image(x, cfg))
    return cfg, model, params


@pytest.mark.slow
class TestMaskDINO:
    def test_forward_shapes(self, tiny_dino_model):
        cfg, model, params = tiny_dino_model
        out = model.apply(params, jnp.zeros((2, 64, 64, 3)))
        L = cfg.MODEL.MASK_FORMER.DEC_LAYERS  # (DEC_LAYERS-1) + initial
        q = cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES
        assert out["pred_logits"].shape == (L, 2, q, 1)
        assert out["pred_boxes"].shape == (L, 2, q, 4)
        assert out["pred_masks"].shape == (L, 2, q, 16, 16)
        assert out["enc_cls"].shape == (2, q, 1)
        b = np.asarray(out["pred_boxes"])
        assert ((b >= 0) & (b <= 1)).all()

    def test_dn_layout(self, tiny_dino_model):
        """Training call adds groups*2*M dn queries ahead of match queries."""
        cfg, model, params = tiny_dino_model
        m = cfg.INPUT.MAX_INSTANCES
        groups = max(1, cfg.MODEL.MASK_DINO.DN_NUM // m)
        gt_classes = jnp.zeros((2, m), jnp.int32)
        gt_boxes = jnp.full((2, m, 4), 0.5)
        gt_valid = jnp.ones((2, m), bool)
        out = model.apply(params, jnp.zeros((2, 64, 64, 3)),
                          deterministic=True, gt_classes=gt_classes,
                          gt_boxes=gt_boxes, gt_valid=gt_valid,
                          dn_rng=jax.random.key(0))
        t = groups * 2 * m
        q = cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES
        assert out["pred_logits"].shape[2] == t + q
        assert out["dn_meta"]["total"] == t

    def test_train_step_improves_loss(self, tiny_dino_model):
        from vision_instance_seg_tpu.engine.solver import make_optimizer
        from vision_instance_seg_tpu.engine.trainer import (
            TrainState, make_train_step)

        cfg, model, params = tiny_dino_model
        cfg = cfg.clone()
        cfg.SOLVER.BASE_LR = 1e-3
        cfg.SOLVER.WARMUP_ITERS = 0
        cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
        params = jax.tree.map(jnp.copy, params)
        tx = make_optimizer(cfg, params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(params))
        step = make_train_step(cfg, model, tx)

        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.float32)
        masks = np.zeros((2, 4, 64, 64), np.uint8)
        masks[:, 0, 8:32, 8:32] = 1
        batch = {
            "image": jnp.asarray(img),
            "gt_classes": jnp.zeros((2, 4), jnp.int32),
            "gt_boxes": jnp.asarray(
                np.tile(np.array([8, 8, 32, 32], np.float32), (2, 4, 1))),
            "gt_masks": jnp.asarray(masks),
            "num_instances": jnp.ones((2,), jnp.int32),
        }
        key = jax.random.key(0)
        losses = []
        for _ in range(8):
            state, logs = step(state, batch, key)
            losses.append(float(logs["loss_total"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_inference(self, tiny_dino_model):
        from vision_instance_seg_tpu.models import make_inference_fn

        cfg, model, params = tiny_dino_model
        infer = make_inference_fn(model, cfg)
        out = infer(params, jnp.zeros((1, 64, 64, 3)))
        assert out["boxes"].shape == (1, 8, 4)
        assert out["mask_probs"].shape == (1, 8, 16, 16)


@pytest.mark.slow
class TestLeanServingPath:
    """aux_masks=False (the serving config, make_inference_fn) must return
    the SAME final-layer predictions as the training forward: M2F attention
    biases are rebuilt from per-level downsampled mask features (linearity
    of resize, transformer_decoder._attn_mask_from_features) and MaskDINO
    skips pure-deep-supervision heads, so in fp32 the result is bit-exact.
    """

    def test_mask2former_final_layer_exact(self, tiny_model):
        cfg, model, params = tiny_model
        x = jax.random.normal(jax.random.key(3), (2, 64, 64, 3)) * 40 + 110
        cls_full, mask_full = model.apply(params, x, deterministic=True)
        cls_lean, mask_lean = model.apply(params, x, deterministic=True,
                                          aux_masks=False)
        assert mask_lean.shape[0] == 1          # only the final mask kept
        assert cls_lean.shape == cls_full.shape  # cls stack stays full
        np.testing.assert_array_equal(np.asarray(cls_lean[-1]),
                                      np.asarray(cls_full[-1]))
        np.testing.assert_array_equal(np.asarray(mask_lean[-1]),
                                      np.asarray(mask_full[-1]))

    def test_maskdino_final_layer_exact(self, tiny_dino_model):
        cfg, model, params = tiny_dino_model
        x = jax.random.normal(jax.random.key(4), (1, 64, 64, 3)) * 40 + 110
        full = model.apply(params, x, deterministic=True)
        lean = model.apply(params, x, deterministic=True, aux_masks=False)
        assert lean["pred_masks"].shape[0] == 1
        np.testing.assert_array_equal(np.asarray(lean["pred_logits"][-1]),
                                      np.asarray(full["pred_logits"][-1]))
        np.testing.assert_array_equal(np.asarray(lean["pred_masks"][-1]),
                                      np.asarray(full["pred_masks"][-1]))
        np.testing.assert_array_equal(np.asarray(lean["pred_boxes"][-1]),
                                      np.asarray(full["pred_boxes"][-1]))


@pytest.mark.slow
class TestEndToEnd:
    def test_forward_shapes(self, tiny_model):
        cfg, model, params = tiny_model
        x = jnp.zeros((2, 64, 64, 3))
        cls, masks = model.apply(params, x)
        n_layers = cfg.MODEL.MASK_FORMER.DEC_LAYERS  # (DEC_LAYERS-1) + initial
        assert cls.shape == (n_layers, 2, 8, 2)
        assert masks.shape == (n_layers, 2, 8, 16, 16)

    def test_train_step_improves_loss(self, tiny_model):
        from vision_instance_seg_tpu.engine.solver import make_optimizer
        from vision_instance_seg_tpu.engine.trainer import (
            TrainState, make_train_step)

        cfg, model, params = tiny_model
        cfg = cfg.clone()
        cfg.SOLVER.BASE_LR = 1e-3
        cfg.SOLVER.WARMUP_ITERS = 0
        cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
        # the jitted step donates its input state — work on a copy so the
        # module-scoped fixture's params survive for later tests
        params = jax.tree.map(jnp.copy, params)
        tx = make_optimizer(cfg, params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(params))
        step = make_train_step(cfg, model, tx)

        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.float32)
        masks = np.zeros((2, 4, 64, 64), np.uint8)
        masks[:, 0, 8:32, 8:32] = 1
        batch = {
            "image": jnp.asarray(img),
            "gt_classes": jnp.zeros((2, 4), jnp.int32),
            "gt_masks": jnp.asarray(masks),
            "num_instances": jnp.ones((2,), jnp.int32),
        }
        key = jax.random.key(0)
        losses = []
        for _ in range(8):
            state, logs = step(state, batch, key)
            losses.append(float(logs["loss_total"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_instance_inference(self, tiny_model):
        from vision_instance_seg_tpu.models import make_inference_fn

        cfg, model, params = tiny_model
        infer = make_inference_fn(model, cfg)
        out = infer(params, jnp.zeros((1, 64, 64, 3)))
        assert out["scores"].shape == (1, 8)
        assert out["labels"].shape == (1, 8)
        assert out["mask_probs"].shape == (1, 8, 16, 16)
        s = np.asarray(out["scores"][0])
        assert (np.diff(s) <= 1e-6).all()  # sorted descending
