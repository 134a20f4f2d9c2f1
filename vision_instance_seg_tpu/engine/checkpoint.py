"""Checkpoint save/resume (orbax) + pretrained-weight import.

Replaces the reference stack's ``DetectionCheckpointer.resume_or_load``
(train_experiments.py:21,115-124; train_original.py:335). orbax gives
atomic directory saves (preemption-safe — SURVEY.md §5 failure-detection
build note) and zero-copy restore onto the existing sharded pytree.

``load_pretrained_backbone`` accepts torch ``.pth``/detectron2 ``.pkl``
ImageNet checkpoints (reference initializes from
``detectron2://ImageNetPretrained/torchvision/R-50.pkl``,
train_original.py:267) and maps them onto the JAX parameter tree via
utils/weights.py.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state: Any, tag) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(ckpt_dir), f"ckpt_{tag}")
    _checkpointer().save(path, jax.device_get(state), force=True)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_step = None, -1
    final = None
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"ckpt_(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(ckpt_dir, name), int(m.group(1))
        if name == "ckpt_final":
            final = os.path.join(ckpt_dir, name)
    return final or best


def load_checkpoint(path: str, target_state: Any) -> Any:
    restored = _checkpointer().restore(os.path.abspath(path),
                                       item=jax.device_get(target_state))
    return jax.tree_util.tree_map(lambda t, r: r, target_state, restored)


def load_pretrained_backbone(weights_path: str, params: Any) -> Any:
    """Initialize params from a torch/detectron2 checkpoint.

    Auto-detects scope: a full trained MaskDINO/Mask2Former checkpoint
    (``sem_seg_head.*`` keys — what the reference loads at
    evaluate.py:113-115) imports the whole model via
    ``import_full_model_weights``; an ImageNet backbone checkpoint maps
    onto the backbone subtree only."""
    from vision_instance_seg_tpu.utils.weights import (
        import_backbone_weights, import_full_model_weights, load_torch_state)
    state = load_torch_state(weights_path)
    if any(k.startswith("sem_seg_head.") for k in state):
        new_params, _ = import_full_model_weights(weights_path, params)
        return new_params
    return import_backbone_weights(weights_path, params)
