"""Two-process CPU dry-run of the multi-host SPMD path (VERDICT r4 #5).

Everything multi-host in this repo was unit-tested with INJECTED
process_index/count in one process; this script runs the real thing:
it spawns TWO coordinated `jax.distributed` processes on localhost (CPU
backend, 2 virtual devices each) and drives, end to end,

- ``comm.initialize`` (the reference's --dist-url/--num-machines/
  --machine-rank surface, reference train_experiments.py:241-248) and the
  coordinator handshake,
- the striped ``TrainLoader`` (each process materializes only its
  contiguous per-process slice of the global batch),
- jitted SPMD train steps on a dp mesh spanning BOTH processes
  (``jax.make_array_from_process_local_data`` in data/loader.shard_batch),
- main-process-only checkpointing behind a real barrier,
- per-process strided eval + ``comm.all_gather_objects`` detection merge.

Usage: python scripts/multihost_dryrun.py               # launcher
       (workers are re-spawned internally with --rank)
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

N_PROC = 2
LOCAL_DEVICES = 2

# must precede ANY jax import in this process (launcher included: its
# fixture imports pull in jax, and it must not touch the real TPU chip)
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count"
                             f"={LOCAL_DEVICES}")


def worker(rank: int, port: int, workdir: str, steps: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from vision_instance_seg_tpu.parallel import comm

    assert comm.initialize(dist_url=f"tcp://127.0.0.1:{port}",
                           num_machines=N_PROC, machine_rank=rank)
    assert jax.process_count() == N_PROC, jax.process_count()
    assert jax.process_index() == rank
    assert jax.local_device_count() == LOCAL_DEVICES
    assert len(jax.devices()) == N_PROC * LOCAL_DEVICES
    comm.barrier("boot")

    from fixtures import make_mini_coco
    from test_models import tiny_cfg
    from vision_instance_seg_tpu.data.catalog import DatasetCatalog
    from vision_instance_seg_tpu.data.coco import load_coco_json
    from vision_instance_seg_tpu.engine.trainer import Trainer

    root = Path(workdir) / "mini"
    ann = {"ann_file": str(root / "annotations.json"),
           "image_dir": str(root / "images")}
    name = "multihost_mini"
    DatasetCatalog.register(
        name, lambda: load_coco_json(ann["ann_file"], ann["image_dir"],
                                     name))

    cfg = tiny_cfg()
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = 2
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.SOLVER.IMS_PER_BATCH = 4           # global batch; 2 per process
    cfg.SOLVER.MAX_ITER = steps
    cfg.SOLVER.WARMUP_ITERS = 1
    cfg.SOLVER.CHECKPOINT_PERIOD = 2       # exercises main-only save+barrier
    cfg.TEST.EVAL_PERIOD = 10 ** 9
    cfg.TEST.SCORE_THRESH = 0.05
    cfg.TEST.BATCH_SIZE = 1
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.INPUT.TEST_PAD_H = cfg.INPUT.TEST_PAD_W = 64
    cfg.OUTPUT_DIR = str(root / "out")
    cfg.TPU.MESH_SHAPE = [N_PROC * LOCAL_DEVICES, 1]   # dp4 across hosts

    print(f"[rank {rank}] init ok, building trainer", flush=True)
    trainer = Trainer(cfg)
    assert trainer.loader.process_count == N_PROC
    assert dict(zip(trainer.mesh.axis_names,
                    trainer.mesh.devices.shape))["data"] == 4
    # Pre-compile the train step, THEN barrier, THEN execute: on this
    # 1-core host the two ranks' compiles interleave and can finish
    # minutes apart, and the FIRST execution of a cross-process psum
    # performs the Gloo TCP handshake — whose ~30 s connect timeout trips
    # if the peer is still compiling (measured failure mode of this
    # dryrun). Real pods compile in lockstep; here we restore lockstep by
    # swapping in the compiled executable so the jit path cannot
    # recompile after the barrier.
    print(f"[rank {rank}] compiling train step", flush=True)
    from vision_instance_seg_tpu.parallel.mesh import shard_batch

    warm_batch = shard_batch(trainer.loader.make_batch(0), trainer.mesh)
    trainer.train_step = trainer.train_step.lower(
        trainer.state, warm_batch, trainer.rng).compile()
    comm.barrier("compiled")
    print(f"[rank {rank}] training {steps} steps", flush=True)
    logs = trainer.train()
    print(f"[rank {rank}] train done", flush=True)
    # every process computes the same replicated loss; float() on the
    # fully-replicated global output checks cross-process agreement at
    # the jax level (it raises if the array were partially addressable)
    loss = float(logs["loss_total"])

    print(f"[rank {rank}] evaluating", flush=True)
    res = trainer.evaluate()               # strided subsets + gather merge
    print(f"[rank {rank}] eval done", flush=True)
    gathered = comm.all_gather_objects([rank, loss])
    assert [g[0] for g in gathered] == [0, 1], gathered
    assert abs(gathered[0][1] - gathered[1][1]) < 1e-6, gathered
    ckpts = sorted(os.listdir(trainer.checkpoint_dir()))
    comm.barrier("done")
    if rank == 0:
        print("MULTIHOST_OK " + json.dumps({
            "processes": jax.process_count(),
            "global_devices": len(jax.devices()),
            "steps": steps, "final_loss": round(loss, 4),
            "checkpoints": ckpts,
            "segm_AP_finite": bool(res["segm"]["AP"] == res["segm"]["AP"]),
        }), flush=True)
    # leave the coordination service cleanly rather than relying on the
    # atexit ordering (a straggling rank trips the Shutdown barrier for
    # everyone)
    jax.distributed.shutdown()


def launcher(steps: int, timeout_s: int) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")   # never touch the TPU here
    with socket.socket() as s:             # free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    workdir = tempfile.mkdtemp(prefix="vist_multihost_")
    root = Path(workdir) / "mini"
    root.mkdir(parents=True)
    # dataset built ONCE by the launcher so workers never race on files
    from fixtures import make_mini_coco

    make_mini_coco(root, n_images=5, seed=0, height=60, width=76,
                   max_inst=2)

    procs = []
    for rank in range(N_PROC):
        procs.append(subprocess.Popen(
            [sys.executable, "-u", __file__, "--rank", str(rank),
             "--port", str(port), "--workdir", workdir,
             "--steps", str(steps)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    deadline = time.time() + timeout_s
    outs = [None] * N_PROC
    for i, p in enumerate(procs):
        try:
            outs[i], _ = p.communicate(timeout=max(5, deadline - time.time()))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            outs[i], _ = p.communicate()
            print(f"rank {i} TIMED OUT\n{outs[i]}")
            return 1
    ok = all(p.returncode == 0 for p in procs) and "MULTIHOST_OK" in outs[0]
    for i, out in enumerate(outs):
        with open(f"/tmp/multihost_rank{i}.log", "w") as f:
            f.write(out)
        tail = "\n".join(out.strip().splitlines()[-8:])
        print(f"--- rank {i} (exit {procs[i].returncode}, full log "
              f"/tmp/multihost_rank{i}.log) ---\n{tail}")
    if ok:
        line = [ln for ln in outs[0].splitlines()
                if ln.startswith("MULTIHOST_OK")][0]
        print(line)
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--workdir", default="")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()
    if args.rank is None:
        sys.exit(launcher(args.steps, args.timeout))
    try:
        worker(args.rank, args.port, args.workdir, args.steps)
    except BaseException:
        import traceback

        traceback.print_exc()
        sys.stdout.flush()
        sys.stderr.flush()
        raise


if __name__ == "__main__":
    main()
