"""Window-attention microbench: jnp vs Pallas kernel at Swin stage shapes.

Scan-timed on the real TPU. Shapes: Swin-T at 800px -> per-stage
(nW, nH, N=49, hd=32) with nW in {841, 225, 64, 16} (ws=7, padded canvases).

Usage: python scripts/bench_wattn.py [--batch 1]
"""

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20


def _time(fn, *args, iters=5):
    @jax.jit
    def run(*a):
        def body(carry, _):
            out = fn(a[0] + carry * 1e-30, *a[1:])
            return carry + jnp.sum(out.astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return tot

    t0 = time.perf_counter()
    float(run(*args))
    compile_s = time.perf_counter() - t0
    float(run(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3 / REPS, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    from vision_instance_seg_tpu.kernels.window_attention import (
        fused_window_attention)
    from vision_instance_seg_tpu.models.swin import (
        reference_window_attention)

    rng = np.random.default_rng(0)
    stages = [(841, 3), (225, 6), (64, 12), (16, 24)]   # (nW, nH) Swin-T 800px
    n, hd = 49, 32
    for nw, nh in stages:
        nwt = args.batch * nw
        q = jnp.asarray(rng.normal(size=(nwt, nh, n, hd)), jnp.bfloat16)
        rel = jnp.asarray(rng.normal(size=(nh, n, n)), jnp.float32)
        scale = hd ** -0.5
        for name, fn in [("jnp", reference_window_attention),
                         ("pallas", fused_window_attention)]:
            def attn(qq, kk, vv, fn=fn, nw=nw):
                return fn(qq, kk, vv, rel, None, scale, nw)
            try:
                ms, cs = _time(attn, q, q, q)
                print(json.dumps({"stage_nw": nw, "nh": nh, "impl": name,
                                  "ms": round(ms, 3),
                                  "compile_s": round(cs, 1)}), flush=True)
            except Exception as e:
                print(json.dumps({"stage_nw": nw, "impl": name,
                                  "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
