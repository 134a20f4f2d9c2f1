"""Training engine: jitted SPMD train step + hook loop.

Replaces the reference stack's ``DefaultTrainer``/``SimpleTrainer`` (used at
train_experiments.py:112, train_original.py:334). The hot loop is a single
jitted function over (state, batch, rng) with donated state — forward
(backbone -> pixel decoder -> masked decoder), Hungarian match, CE/dice/
focal point losses, backward, clip, AdamW — the step never leaves the chip.
Host-side per step: next-batch augmentation (background thread) + metric
scalars every LOG_PERIOD.

Checkpointing uses orbax (reference: DetectionCheckpointer,
train_experiments.py:115-124) with resume semantics and preemption-safe
atomic saves.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from vision_instance_seg_tpu.data.catalog import DatasetCatalog
from vision_instance_seg_tpu.data.loader import TrainLoader
from vision_instance_seg_tpu.engine.solver import make_lr_schedule, make_optimizer
from vision_instance_seg_tpu.models.criterion import (
    criterion_config_from_cfg, set_criterion)
from vision_instance_seg_tpu.models.meta_arch import build_model, normalize_image
from vision_instance_seg_tpu.parallel.mesh import (
    batch_sharding, make_mesh, opt_state_shardings, param_shardings,
    replicated, shard_batch)

logger = logging.getLogger(__name__)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(cfg, model, rng, sample_batch) -> TrainState:
    images = jnp.asarray(sample_batch["image"][:1], jnp.float32)
    params = jax.jit(model.init)(rng, normalize_image(images, cfg))
    tx = make_optimizer(cfg, params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


def make_train_step(cfg, model, tx) -> Callable:
    """Build the jitted train step. Returns (state, batch, rng) -> (state, metrics)."""
    from vision_instance_seg_tpu.models.meta_arch import MaskDINO
    dino = isinstance(model, MaskDINO)
    if dino:
        from vision_instance_seg_tpu.models.criterion_dino import (
            dino_criterion_config_from_cfg, maskdino_criterion)
        dcc = dino_criterion_config_from_cfg(cfg)
    else:
        cc = criterion_config_from_cfg(cfg)

    dn_warmup = int(cfg.MODEL.MASK_DINO.get("DN_WARMUP_STEPS", 0)) if dino \
        else 0

    def loss_fn(params, batch, rng, step):
        drop_rng, crit_rng, dn_rng = jax.random.split(rng, 3)
        images = normalize_image(batch["image"].astype(jnp.float32), cfg)
        m = batch["gt_classes"].shape[1]
        gt_valid = (jnp.arange(m)[None, :]
                    < batch["num_instances"][:, None])
        if dino:
            from vision_instance_seg_tpu.models.box_ops import (
                box_xyxy_to_cxcywh)
            h, w = images.shape[1], images.shape[2]
            scale = jnp.asarray([w, h, w, h], jnp.float32)
            boxes = box_xyxy_to_cxcywh(
                batch["gt_boxes"].astype(jnp.float32) / scale)
            boxes = jnp.clip(boxes, 1e-4, 1.0)
            out = model.apply(
                params, images, deterministic=False,
                rngs={"dropout": drop_rng},
                gt_classes=batch["gt_classes"], gt_boxes=boxes,
                gt_valid=gt_valid, dn_rng=dn_rng)
            dn_scale = (jnp.minimum(step.astype(jnp.float32) / dn_warmup,
                                    1.0) if dn_warmup > 0 else 1.0)
            return maskdino_criterion(
                crit_rng, out, batch["gt_classes"], batch["gt_masks"],
                boxes, gt_valid, dcc, dn_scale=dn_scale)
        cls_layers, mask_layers = model.apply(
            params, images, deterministic=False, rngs={"dropout": drop_rng})
        total, logs = set_criterion(
            crit_rng, cls_layers, mask_layers, batch["gt_classes"],
            batch["gt_masks"], gt_valid, cc)
        return total, logs

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng, state.step)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        logs["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt)
        return new_state, logs

    return jax.jit(train_step, donate_argnums=(0,))


class Trainer:
    """Full training driver: data, step loop, checkpoints, eval hook."""

    def __init__(self, cfg, model=None, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg, batch_size=int(cfg.SOLVER.IMS_PER_BATCH))
        self.model = model if model is not None else build_model(cfg)
        dicts: List[dict] = []
        for name in cfg.DATASETS.TRAIN:
            dicts.extend(DatasetCatalog.get(name))
        self.loader = TrainLoader(dicts, cfg)
        self.rng = jax.random.key(cfg.SEED)
        sample = self.loader.make_batch(0)
        self.state = create_train_state(cfg, self.model, self.rng, sample)
        self._tx = make_optimizer(cfg, self.state.params)
        self._commit_state_to_mesh()
        self.train_step = make_train_step(cfg, self.model, self._tx)
        self.schedule = make_lr_schedule(cfg)
        self.start_iter = 0
        self.hooks: List[Callable[[int, Dict], None]] = []
        os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
        self._metrics_file = os.path.join(cfg.OUTPUT_DIR, "metrics.json")
        self._infer_fn = None
        self.best_metric = float("-inf")   # best eval segm AP so far

    def _commit_state_to_mesh(self):
        """Place the train state on the mesh: params tensor-parallel over
        'model' (pure replication when model=1), optimizer moments sharded
        to MATCH the params, step replicated. GSPMD propagates from here and
        step donation keeps the placement. Re-run after any host-side state
        swap (checkpoint restore / weight import), or every jitted step
        re-uploads the weight tree."""
        psh = param_shardings(self.state.params, self.mesh)
        self.state = TrainState(
            step=jax.device_put(self.state.step, replicated(self.mesh)),
            params=jax.device_put(self.state.params, psh),
            opt_state=jax.device_put(
                self.state.opt_state,
                opt_state_shardings(self.state.opt_state, self.state.params,
                                    self.mesh, pshardings=psh)))

    # -------------------------------------------------- checkpoint/resume
    def checkpoint_dir(self) -> str:
        return os.path.join(os.path.abspath(self.cfg.OUTPUT_DIR), "checkpoints")

    def save_checkpoint(self, tag: Optional[str] = None):
        from vision_instance_seg_tpu.engine.checkpoint import save_checkpoint
        step = int(self.state.step)
        # multi-host: EVERY process must call orbax save — it runs its own
        # sync_global_devices barriers internally and writes host arrays on
        # the primary process only. Gating this to is_main_process()
        # deadlocks on orbax's 'Checkpointer:save_start' barrier (found by
        # the first real two-process run, scripts/multihost_dryrun.py).
        save_checkpoint(self.checkpoint_dir(), self.state,
                        step if tag is None else tag)

    def resume_or_load(self, resume: bool = True):
        from vision_instance_seg_tpu.engine.checkpoint import (
            latest_checkpoint, load_checkpoint, load_pretrained_backbone)
        if resume:
            latest = latest_checkpoint(self.checkpoint_dir())
            if latest is not None:
                self.state = load_checkpoint(latest, self.state)
                self.start_iter = int(self.state.step)
                self._commit_state_to_mesh()   # restore yields host arrays
                logger.info("resumed from %s at iter %d", latest, self.start_iter)
                return self
        w = self.cfg.MODEL.WEIGHTS
        if w:
            self.state = self.state.replace(
                params=load_pretrained_backbone(w, self.state.params))
            self._commit_state_to_mesh()
            logger.info("initialized backbone from %s", w)
        return self

    # --------------------------------------------------------------- eval
    def evaluate(self) -> Dict[str, Dict[str, float]]:
        """COCO bbox+segm AP on cfg.DATASETS.TEST[0] with current params."""
        from vision_instance_seg_tpu.engine.evaluator import COCOEvaluator
        from vision_instance_seg_tpu.models.meta_arch import make_inference_fn
        if self._infer_fn is None:
            self._infer_fn = make_inference_fn(self.model, self.cfg)
        evaluator = COCOEvaluator(self.cfg.DATASETS.TEST[0], self.cfg)
        return evaluator.evaluate(self._infer_fn, self.state.params)

    def _write_metrics(self, obj: Dict) -> None:
        """metrics.json append, main process only (every process computes
        identical replicated logs; one writer avoids interleaved lines)."""
        from vision_instance_seg_tpu.parallel import comm
        if comm.is_main_process():
            with open(self._metrics_file, "a") as f:
                f.write(json.dumps(obj) + "\n")

    def _periodic_eval(self, it: int) -> bool:
        """Mid-training eval (reference TEST.EVAL_PERIOD,
        train_experiments.py:75): logs AP to metrics.json, keeps a "best"
        checkpoint, and returns True when early-stopping patience
        (TEST.EARLY_STOP_PATIENCE eval rounds without segm-AP improvement,
        reference train_template.py:45-57) runs out."""
        metrics = self.evaluate()
        ap = float(metrics.get("segm", {}).get("AP", float("nan")))
        logger.info("eval @ iter %d: segm AP %.4f (best %.4f)", it, ap,
                    self.best_metric)
        self._write_metrics({"iteration": it, "eval": metrics})
        if np.isfinite(ap) and ap > self.best_metric:
            self.best_metric = ap
            self._evals_since_best = 0
            self.save_checkpoint("best")
        else:
            self._evals_since_best += 1
        patience = int(self.cfg.TEST.get("EARLY_STOP_PATIENCE", 0))
        if patience > 0 and self._evals_since_best >= patience:
            logger.info("early stop at iter %d: no segm-AP improvement for "
                        "%d evals", it, self._evals_since_best)
            return True
        return False

    # --------------------------------------------------------------- loop
    def train(self) -> Dict[str, float]:
        cfg = self.cfg
        max_iter = int(cfg.SOLVER.MAX_ITER)
        eval_period = int(cfg.TEST.EVAL_PERIOD)
        self._evals_since_best = 0
        log_period = 20
        data_iter = iter(self.loader)
        last_logs: Dict[str, float] = {}
        t_start = time.time()
        step_times = []
        profiling = False
        try:
            for it in range(self.start_iter, max_iter):
                if cfg.TPU.PROFILE and it == self.start_iter + 10:
                    # trace a steady-state window (skip compile iterations)
                    jax.profiler.start_trace(cfg.TPU.PROFILE_DIR)
                    profiling = True
                if profiling and it == self.start_iter + 15:
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.info("profiler trace written to %s",
                                cfg.TPU.PROFILE_DIR)
                batch = shard_batch(next(data_iter), self.mesh)
                t0 = time.time()
                self.state, logs = self.train_step(self.state, batch,
                                                   self.rng)
                if it % log_period == 0 or it == max_iter - 1:
                    logs = {k: float(v) for k, v in logs.items()}
                    logs["lr"] = float(self.schedule(it))
                    jax.block_until_ready(self.state.params)
                    logs["step_time_s"] = time.time() - t0
                    step_times.append(logs["step_time_s"])
                    last_logs = logs
                    logger.info(
                        "iter %d/%d %s", it, max_iter,
                        " ".join(f"{k}={v:.4g}" for k, v in logs.items()))
                    self._write_metrics({"iteration": it, **logs})
                if (it + 1) % int(cfg.SOLVER.CHECKPOINT_PERIOD) == 0:
                    self.save_checkpoint()
                if (eval_period > 0 and cfg.DATASETS.TEST
                        and (it + 1) % eval_period == 0
                        and (it + 1) < max_iter):
                    if self._periodic_eval(it + 1):
                        break
                for hook in self.hooks:
                    hook(it, last_logs)
        except KeyboardInterrupt:
            # preemption-safe: persist progress before propagating
            logger.warning("interrupted at iter %d — saving checkpoint",
                           int(self.state.step))
            self.save_checkpoint()
            raise
        finally:
            if profiling:
                jax.profiler.stop_trace()
        self.save_checkpoint("final")
        last_logs["total_time_s"] = time.time() - t_start
        return last_logs
