"""Device mesh + sharding rules (SPMD data parallelism and beyond).

Replaces the reference's NCCL/DDP machinery (detectron2 ``launch`` +
torch.distributed, reference train_experiments.py:18,241-248) with the
TPU-native story (SURVEY.md §2.3): one ``jax.sharding.Mesh`` with
('data', 'model') axes; batches sharded over 'data'; parameters replicated
(DP) or sharded over 'model' (TP hook — a config flag, unused at Swin-T/B
scale). XLA inserts the gradient all-reduce over ICI automatically; there is
no user-visible collective code.

Multi-host: ``jax.distributed.initialize`` happens in the CLI entrypoints;
here every helper works on the global device list.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(cfg=None, devices=None, batch_size: Optional[int] = None) -> Mesh:
    """Build the ('data', 'model') mesh. MESH_SHAPE -1 = all remaining.

    If ``batch_size`` is given, the 'data' axis is shrunk to the largest
    divisor of the batch (surplus devices are left out of the mesh) so a
    global batch of any size shards cleanly — e.g. the reference's bs=2
    (SOLVER.IMS_PER_BATCH, train_original.py:279) on an 8-chip host uses a
    2-device data axis rather than failing.
    """
    devices = list(devices if devices is not None else jax.devices())
    axes = list(cfg.TPU.MESH_AXES) if cfg is not None else ["data", "model"]
    shape = list(cfg.TPU.MESH_SHAPE) if cfg is not None else [-1, 1]
    known = int(np.prod([s for s in shape if s != -1]))
    shape = [len(devices) // known if s == -1 else s for s in shape]
    if batch_size is not None and "data" in axes:
        di = axes.index("data")
        other = int(np.prod([s for i, s in enumerate(shape) if i != di]))
        cap = max(len(devices) // max(other, 1), 1)
        d = max(min(shape[di], batch_size, cap), 1)
        while d > 1 and batch_size % d:
            d -= 1
        shape[di] = d
    n_used = int(np.prod(shape))
    if n_used > len(devices):
        raise ValueError(f"mesh shape {shape} > {len(devices)} devices")
    arr = np.asarray(devices[:n_used]).reshape(shape)
    return Mesh(arr, tuple(axes))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis split over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Megatron-style split: column-parallel (shard output features) for the
# expanding half of each pointwise pair, row-parallel (shard input
# features) for the contracting half. GSPMD propagates the activation
# shardings and inserts the all-reduces over ICI. Attention is HEAD-
# sharded by construction: q/k/v (and the deformable value_proj /
# per-head sampling_offsets / attention_weights, all head-major in their
# output features) are column-parallel, so the (B, S, nh, hd) reshape
# carries the 'model' shard onto the head axis and the whole attention
# core — window, dense, and deformable sampling — computes per-head
# shards with zero collectives until the row-parallel out_proj reduce.
# Checked first, so "value_proj" wins over the generic row "proj" rule.
_COLUMN_KEYS = ("linear1", "ffn1", "qkv", "q_proj", "k_proj", "v_proj",
                "value_proj", "sampling_offsets", "attention_weights",
                "mlp/fc1", "layer0")
_ROW_KEYS = ("linear2", "ffn2", "proj", "out_proj", "mlp/fc2", "layer1")


def param_shardings(params: Any, mesh: Mesh,
                    min_size: int = 1 << 14) -> Any:
    """Tensor-parallel NamedSharding tree for a param pytree.

    2-D Dense kernels are partitioned over the mesh's 'model' axis
    (column- or row-parallel by layer role); everything else — biases,
    norms, conv kernels, embeddings, and any kernel whose dims don't
    divide — is replicated. With model=1 this degenerates to pure DP.
    """
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)

    def role_of(parts) -> Optional[str]:
        """Column/row role from the path, nearest module name first.

        Within one component the winning token is the one ending furthest
        right (longest on ties): 'layer0_ffn2' -> ffn2 (row), not the
        MLPHead positional token 'layer0'; 'value_proj' -> value_proj
        (column), not the generic row 'proj'. Plain substring matching
        had both collisions backwards (caught by
        test_deformable_head_sharding_rules) — GSPMD still computed the
        right answer, but with an all-gather-shaped layout instead of the
        Megatron head-sharded one.
        """
        for idx in range(len(parts) - 1, -1, -1):
            part = parts[idx]
            # slash keys ('mlp/fc1') are resolved against THIS part and its
            # immediate parent only, in the same coordinate system as the
            # plain-key search (positions offset by the parent prefix), so
            # an 'mlp/fc*' match in a distant ancestor can't outrank the
            # nearest module name (advisor r4: the old joined-path rfind
            # compared positions from two different strings)
            prefix = parts[idx - 1] + "/" if idx > 0 else ""
            local = prefix + part
            best = (-1, -1, None)              # (end, len, role)
            for keys, role in ((_COLUMN_KEYS, "col"), (_ROW_KEYS, "row")):
                for k in keys:
                    if "/" in k:
                        i = local.rfind(k)
                    else:
                        i = part.rfind(k)
                        if i >= 0:
                            i += len(prefix)
                    if i < 0:
                        continue
                    cand = (i + len(k), len(k), role)
                    if cand[:2] > best[:2]:
                        best = cand
            if best[2]:
                return best[2]
        return None

    def spec(path, x) -> P:
        parts = [str(getattr(p, "key", p)).lower() for p in path]
        name = "/".join(parts)
        nd = getattr(x, "ndim", 0)
        # nn.scan-stacked kernels are (L, in, out): shard the feature
        # dims, leave the scan axis replicated (deformable encoder_layers,
        # window-encoder wenc_layers, swin stage{s}_blocks pair scans)
        scanned = nd == 3 and any(
            t in name for t in ("encoder_layers", "wenc_layers", "_blocks"))
        if tp == 1 or (nd != 2 and not scanned) or x.size < min_size:
            return P()
        role = role_of(parts[:-1])             # leaf name carries no role
        if role == "col" and x.shape[-1] % tp == 0:
            return P(None, None, "model") if scanned else P(None, "model")
        if role == "row":
            if nd == 2 and parts[-1] == "bias":
                # stacked (L, C) bias of a row-parallel scanned layer:
                # replicate (its C is the un-sharded OUTPUT dim)
                return P()
            if x.shape[-2] % tp == 0:
                return P(None, "model", None) if scanned else P("model", None)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, spec(p, x)), params)


def opt_state_shardings(opt_state: Any, params: Any, mesh: Mesh,
                        pshardings: Optional[Any] = None) -> Any:
    """Shardings for an optax state tree that FOLLOW the param shardings.

    Adam moments (and any other params-shaped slots, e.g. inside
    optax.multi_transform's masked sub-states) get the same partitioning as
    their parameter so a TP run doesn't replicate 2x params worth of
    optimizer memory (VERDICT r1: dryrun left opt_state replicated).
    Matching is by tree-path suffix + shape: an opt leaf at
    (..., 'mu', 'params', 'backbone', ..., 'kernel') adopts the sharding of
    the param at ('params', 'backbone', ..., 'kernel'). Scalars and
    unmatched leaves are replicated.
    """
    psh = pshardings if pshardings is not None else param_shardings(params,
                                                                    mesh)
    repl = replicated(mesh)

    def path_keys(path):
        return tuple(str(getattr(p, "key", getattr(p, "name", p)))
                     for p in path)

    pmap = {}
    psh_flat = jax.tree_util.tree_flatten_with_path(psh)[0]
    p_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for (path, sh), (_, leaf) in zip(psh_flat, p_flat):
        pmap[path_keys(path)] = (sh, getattr(leaf, "shape", None))

    def assign(path, leaf):
        keys = path_keys(path)
        shape = getattr(leaf, "shape", None)
        for i in range(len(keys)):          # longest suffix first
            hit = pmap.get(keys[i:])
            if hit is not None and hit[1] == shape:
                return hit[0]
        return repl

    return jax.tree_util.tree_map_with_path(assign, opt_state)


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch dict on the mesh, batch axis over 'data'.

    Multi-host: the host batch is this process's LOCAL slice (the loader
    strides by process) and is assembled into the global array via
    ``jax.make_array_from_process_local_data``."""
    sh = batch_sharding(mesh)
    multihost = jax.process_count() > 1

    def put(x):
        if isinstance(x, (int, float)):
            return x
        if multihost:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return {k: put(v) for k, v in batch.items()}


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0
