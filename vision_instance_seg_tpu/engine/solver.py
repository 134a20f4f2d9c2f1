"""Optimizer + LR schedule factory (optax), Detectron2-solver-compatible.

Reproduces the reference solver semantics (train_original.py:278-299,
train_experiments.py:67-75): AdamW, base LR with backbone multiplier,
WarmupMultiStepLR (steps at 80%/90%, gamma 0.1) or WarmupCosineLR, linear
warmup, global grad-norm clip 0.01, weight-decay exemptions for norm/bias/
embedding params — as one optax chain so the whole update is jitted.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax


def make_lr_schedule(cfg) -> optax.Schedule:
    s = cfg.SOLVER
    base = float(s.BASE_LR)
    warmup = int(s.WARMUP_ITERS)
    factor = float(s.WARMUP_FACTOR)
    method = s.WARMUP_METHOD
    if method not in ("linear", "constant"):
        raise ValueError(f"SOLVER.WARMUP_METHOD {method!r} not supported "
                         "(detectron2 semantics: 'linear' or 'constant')")

    def warm_lr(stepf):
        if method == "constant":
            return jnp.full_like(stepf, base * factor)
        return base * (factor + (1 - factor) * stepf / max(warmup, 1))

    if s.LR_SCHEDULER_NAME == "WarmupCosineLR":
        def sched(step):
            step = jnp.asarray(step, jnp.float32)
            t = jnp.clip((step - warmup) / max(s.MAX_ITER - warmup, 1), 0, 1)
            cos = base * 0.5 * (1 + jnp.cos(jnp.pi * t))
            return jnp.where(step < warmup, warm_lr(step), cos)
        return sched

    steps = jnp.asarray(list(s.STEPS), jnp.int32)
    gamma = float(s.GAMMA)

    def sched(step):
        stepf = jnp.asarray(step, jnp.float32)
        n_passed = jnp.sum(jnp.asarray(step)[None] >= steps)
        multi = base * gamma ** n_passed.astype(jnp.float32)
        return jnp.where(stepf < warmup, warm_lr(stepf), multi)

    return sched


def _frozen_stage(joined: str, freeze_at: int) -> bool:
    """detectron2 ResNet.freeze(FREEZE_AT) semantics: >=1 freezes the stem,
    >=k freezes res-k (k in 2..5). Matched on the backbone param paths
    (models/resnet.py: stem_*, res{k}_block{b})."""
    if freeze_at >= 1 and "/stem" in joined:
        return True
    for k in (2, 3, 4, 5):
        if freeze_at >= k and f"/res{k}_block" in joined:
            return True
    return False


def _param_labels(params, backbone_key: str = "backbone",
                  freeze_at: int = 0) -> Any:
    """Label params 'backbone(_nodecay)' / 'main' / 'nodecay' / 'frozen'.

    No-decay set mirrors detectron2/MaskDINO: norm scales/biases, all biases,
    relative position bias tables, query/level/position embeddings
    (SOLVER.WEIGHT_DECAY_NORM / WEIGHT_DECAY_EMBED = 0 in the reference).
    'frozen' = MODEL.BACKBONE.FREEZE_AT stages: updates zeroed, no decay —
    the d2 requires_grad=False contract (FrozenBN stats are non-params
    already).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label(path) -> str:
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/" + "/".join(str(n) for n in names)
        nodecay = ("norm" in joined.lower() or joined.endswith("bias")
                   or "bias_table" in joined or "_embed" in joined
                   or "query_feat" in joined or "query_box" in joined
                   or "dn_label_enc" in joined or "log_sigma" in joined)
        bb = f"/{backbone_key}/" in f"{joined}/"
        if bb and _frozen_stage(joined, freeze_at):
            return "frozen"
        if bb and nodecay:
            return "backbone_nodecay"
        if bb:
            return "backbone"
        return "nodecay" if nodecay else "main"

    labels = {tuple(k for k in path): label(path) for path, _ in flat}
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [labels[tuple(k for k in path)] for path, _ in flat])


def make_optimizer(cfg, params) -> optax.GradientTransformation:
    s = cfg.SOLVER
    sched = make_lr_schedule(cfg)
    bb_mult = float(s.BACKBONE_MULTIPLIER)
    wd = float(s.WEIGHT_DECAY)

    if s.OPTIMIZER == "ADAMW":
        def opt(lr_scale: float, weight_decay: float):
            return optax.chain(
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                optax.add_decayed_weights(weight_decay),
                optax.scale_by_schedule(lambda t: -lr_scale * sched(t)),
            )
    elif s.OPTIMIZER == "SGD":
        # d2 SGD: L2 decay folded into the gradient, then momentum
        def opt(lr_scale: float, weight_decay: float):
            return optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.trace(decay=float(s.MOMENTUM)),
                optax.scale_by_schedule(lambda t: -lr_scale * sched(t)),
            )
    else:
        raise ValueError(f"SOLVER.OPTIMIZER {s.OPTIMIZER!r} not supported "
                         "('ADAMW' or 'SGD')")

    tx = optax.multi_transform(
        {"main": opt(1.0, wd),
         "nodecay": opt(1.0, 0.0),
         "backbone": opt(bb_mult, wd),
         "backbone_nodecay": opt(bb_mult, 0.0),
         "frozen": optax.set_to_zero()},
        _param_labels(params, freeze_at=int(cfg.MODEL.BACKBONE.FREEZE_AT)))

    if s.CLIP_GRADIENTS.ENABLED:
        if float(s.CLIP_GRADIENTS.NORM_TYPE) != 2.0:
            raise NotImplementedError(
                "SOLVER.CLIP_GRADIENTS.NORM_TYPE: only the L2 global norm "
                "is implemented (optax.clip_by_global_norm)")
        clip = optax.clip_by_global_norm(float(s.CLIP_GRADIENTS.CLIP_VALUE))
        tx = optax.chain(clip, tx)
    return tx
