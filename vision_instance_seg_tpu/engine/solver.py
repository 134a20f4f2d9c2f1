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

    if s.LR_SCHEDULER_NAME == "WarmupCosineLR":
        def sched(step):
            step = jnp.asarray(step, jnp.float32)
            warm = base * (factor + (1 - factor) * step / max(warmup, 1))
            t = jnp.clip((step - warmup) / max(s.MAX_ITER - warmup, 1), 0, 1)
            cos = base * 0.5 * (1 + jnp.cos(jnp.pi * t))
            return jnp.where(step < warmup, warm, cos)
        return sched

    steps = jnp.asarray(list(s.STEPS), jnp.int32)
    gamma = float(s.GAMMA)

    def sched(step):
        stepf = jnp.asarray(step, jnp.float32)
        warm = base * (factor + (1 - factor) * stepf / max(warmup, 1))
        n_passed = jnp.sum(jnp.asarray(step)[None] >= steps)
        multi = base * gamma ** n_passed.astype(jnp.float32)
        return jnp.where(stepf < warmup, warm, multi)

    return sched


def _param_labels(params, backbone_key: str = "backbone") -> Any:
    """Label each param 'backbone' / 'backbone_nodecay' / 'main' / 'nodecay'.

    No-decay set mirrors detectron2/MaskDINO: norm scales/biases, all biases,
    relative position bias tables, query/level/position embeddings
    (SOLVER.WEIGHT_DECAY_NORM / WEIGHT_DECAY_EMBED = 0 in the reference).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label(path) -> str:
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(n) for n in names)
        nodecay = ("norm" in joined.lower() or joined.endswith("bias")
                   or "bias_table" in joined or "_embed" in joined
                   or "query_feat" in joined or "query_box" in joined
                   or "dn_label_enc" in joined or "log_sigma" in joined)
        bb = f"/{backbone_key}/" in f"/{joined}/"
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

    def adamw(lr_scale: float, weight_decay: float):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_schedule(lambda t: -lr_scale * sched(t)),
        )

    tx = optax.multi_transform(
        {"main": adamw(1.0, wd),
         "nodecay": adamw(1.0, 0.0),
         "backbone": adamw(bb_mult, wd),
         "backbone_nodecay": adamw(bb_mult, 0.0)},
        _param_labels(params))

    if s.CLIP_GRADIENTS.ENABLED:
        clip = optax.clip_by_global_norm(float(s.CLIP_GRADIENTS.CLIP_VALUE))
        tx = optax.chain(clip, tx)
    return tx
