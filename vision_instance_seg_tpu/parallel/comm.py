"""Thin host-side communication helpers (multi-host SPMD).

The reference gets cross-process result gathering implicitly from
detectron2's ``comm`` (used by COCOEvaluator under DDP — SURVEY.md §2.3
"expose a thin comm module"). Here the equivalents ride
``jax.experimental.multihost_utils`` over the JAX distributed runtime:

- ``initialize()``: `jax.distributed.initialize` when env vars are present
  (no-op single-host).
- ``barrier(name)``: sync all hosts.
- ``all_gather_objects(obj)``: gather arbitrary picklable objects from all
  hosts (used to merge per-host COCO detection lists before evaluation).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, List

import jax
import numpy as np


def initialize(dist_url: str | None = None,
               num_machines: int | None = None,
               machine_rank: int | None = None) -> bool:
    """Start the distributed runtime if a coordinator is configured.

    The reference CLIs expose ``--dist-url/--num-machines/--machine-rank``
    (reference train_experiments.py:241-248, fed to detectron2 ``launch``);
    those map directly onto ``jax.distributed.initialize``'s
    coordinator_address / num_processes / process_id. Explicit arguments
    win over the JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS env vars;
    with neither, single-host runs are a no-op.
    """
    # NOT jax.process_count(): that initializes the XLA backend, after
    # which jax.distributed.initialize refuses to run (flushed out by the
    # first real two-process run, scripts/multihost_dryrun.py)
    if jax.distributed.is_initialized():
        return True
    # detectron2's CLI default is "--dist-url auto" (reference
    # train_experiments.py:248) which means "pick a local coordinator for
    # a single-machine launch"; with num_machines <= 1 there is nothing to
    # coordinate, so treat it (and empty) as the single-host no-op rather
    # than handing "auto" to jax.distributed.initialize as an address.
    if dist_url in ("", "auto") and (num_machines is None
                                     or num_machines <= 1):
        dist_url = None
    if num_machines is not None and num_machines <= 1 and not dist_url:
        return False
    if dist_url:
        if dist_url == "auto":
            raise ValueError(
                "--dist-url auto is only meaningful for single-machine "
                "launches (num_machines<=1); multi-machine runs need an "
                "explicit tcp://host:port coordinator address")
        # accept detectron2's "tcp://host:port" and bare "host:port"
        addr = dist_url.split("//", 1)[-1]
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=num_machines if num_machines else None,
            process_id=machine_rank if machine_rank is not None else None)
        return True
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather a picklable object from every host (ordered by process index)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # pad to the max payload size across hosts
    size = np.array([payload.size], np.int32)
    sizes = multihost_utils.process_allgather(size).reshape(-1)
    maxlen = int(sizes.max())
    padded = np.zeros(maxlen, np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, :int(sizes[i])].tobytes())
            for i in range(jax.process_count())]
