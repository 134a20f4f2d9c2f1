"""TPU bench + parity check for the Pallas MSDeformAttn kernel.

Compares kernels/msdeform_attn.py against the jnp reference core at the
real encoder shapes (800x800 canvas -> levels 100/50/25, 13125 tokens).
Scan-timed like bench.py (single-dispatch wall-clock on the tunneled axon
platform carries ~25 ms of host overhead).

Usage: python scripts/bench_msdeform.py [--batch 8] [--dtype bf16]
       [--levels 3|4] [--reps 10] [--no-jnp]
"""

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from vision_instance_seg_tpu.kernels.msdeform_attn import (
    ms_deform_attn_encoder_pallas)
from vision_instance_seg_tpu.models.deform_attn import ms_deform_attn_core_jnp

NH, HD, P = 8, 32, 4


def make_inputs(batch, shapes, dtype, offset_px=3.0, seed=0):
    rng = np.random.default_rng(seed)
    nl = len(shapes)
    q = sum(h * w for h, w in shapes)
    value = rng.standard_normal((batch, q, NH, HD)).astype(np.float32)

    refs = []
    for (h, w) in shapes:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)
    ref = np.tile(ref[None, :, None, None, None, :], (batch, 1, NH, nl, P, 1))
    off = rng.uniform(-offset_px, offset_px,
                      (batch, q, NH, nl, P, 2)).astype(np.float32)
    wh = np.array([[w, h] for h, w in shapes], np.float32)
    loc = (ref + off / wh[None, None, None, :, None, :]).astype(np.float32)
    aw = rng.standard_normal((batch, q, NH, nl * P)).astype(np.float32)
    aw = np.asarray(jax.nn.softmax(jnp.asarray(aw), -1)).reshape(
        batch, q, NH, nl, P)
    return (jnp.asarray(value, dtype), jnp.asarray(loc),
            jnp.asarray(aw, jnp.float32))


def scan_time(fn, args, reps=8, iters=5):
    """Median seconds per call, fn repeated `reps` times inside one jit."""

    @jax.jit
    def run(value, loc, aw):
        def body(carry, _):
            out = fn(value + carry * 1e-30, loc, aw)
            return (jnp.sum(out.astype(jnp.float32)) * 0.0).astype(
                carry.dtype) + carry, None

        out, _ = jax.lax.scan(body, jnp.zeros((), args[0].dtype), None,
                              length=reps)
        return out

    float(run(*args))                                   # compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(*args))
        times.append(time.perf_counter() - t0)
    return statistics.median(times) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--levels", type=int, default=3, choices=[3, 4])
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--no-jnp", action="store_true",
                    help="skip the (slow) jnp-core timing")
    ap.add_argument("--bwd", action="store_true",
                    help="also time the blocked Pallas backward")
    ap.add_argument("--queries", type=int, default=0,
                    help="bench the FREE-query (decoder) path with this "
                         "many queries: one-hot XLA core vs jnp gather "
                         "core, fwd and (with --bwd) fwd+bwd")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin ignores "
                         "JAX_PLATFORMS and hangs when the tunnel is down)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # level order matches pixel_decoder (lowest resolution first)
    shapes = [(25, 25), (50, 50), (100, 100)]
    if args.levels == 4:
        shapes = [(13, 13)] + shapes
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    print(f"backend={jax.default_backend()} shapes={shapes} "
          f"batch={args.batch} dtype={args.dtype}", flush=True)

    inputs = make_inputs(args.batch, shapes, dtype)

    if args.queries:
        from vision_instance_seg_tpu.models.deform_attn import (
            ms_deform_attn_core_onehot)

        value, loc, aw = inputs
        rng = np.random.default_rng(9)
        # free queries: random locations anywhere (decoder box samples)
        qn = args.queries
        loc_q = jnp.asarray(rng.uniform(
            0.02, 0.98, (args.batch, qn, NH, len(shapes), P, 2))
            .astype(np.float32))
        aw_q = jnp.asarray(jax.nn.softmax(jnp.asarray(
            rng.standard_normal((args.batch, qn, NH, len(shapes) * P))
            .astype(np.float32)), -1).reshape(
                args.batch, qn, NH, len(shapes), P))
        for name, core in (("onehot", ms_deform_attn_core_onehot),
                           ("jnp-gather", ms_deform_attn_core_jnp)):
            if name == "jnp-gather" and args.no_jnp:
                continue
            if args.bwd:
                def fn(v, l, a, core=core):
                    out, vjp = jax.vjp(
                        lambda vv, ll, aa: core(vv, shapes, ll, aa),
                        v, l, a)
                    gs = vjp(out)
                    return (gs[0].astype(jnp.float32).sum() + gs[1].sum()
                            + gs[2].sum())
            else:
                def fn(v, l, a, core=core):
                    return core(v, shapes, l, a)
            t = scan_time(fn, (value, loc_q, aw_q), reps=args.reps)
            kind = "fwd+bwd" if args.bwd else "fwd"
            print(f"free-query {name} {kind} (Q={qn}): {t * 1e3:.2f} "
                  f"ms/call ({t * 1e3 / args.batch:.2f} ms/img)",
                  flush=True)
        return

    # parity on a tiny problem first (fast compile)
    small_shapes = [(12, 12), (6, 6), (3, 3)]
    sv, sl, sa = make_inputs(2, small_shapes, dtype)
    got = ms_deform_attn_encoder_pallas(sv, small_shapes, sl, sa)
    want = ms_deform_attn_core_jnp(sv, small_shapes, sl, sa)
    err = float(jnp.max(jnp.abs(got - want)))
    rel = err / float(jnp.max(jnp.abs(want)))
    print(f"parity (tiny, {args.dtype}): max_abs_err={err:.3e} rel={rel:.3e}",
          flush=True)

    t = scan_time(lambda v, l, a: ms_deform_attn_encoder_pallas(v, shapes, l, a),
                  inputs, reps=args.reps)
    print(f"pallas kernel: {t * 1e3:.2f} ms/call "
          f"({t * 1e3 / args.batch:.2f} ms/img)", flush=True)

    if args.bwd:
        from vision_instance_seg_tpu.kernels.msdeform_attn import (
            ms_deform_attn_encoder_bwd_pallas)

        v, l, a = make_inputs(2, small_shapes, dtype, seed=3)
        g = jnp.asarray(np.random.default_rng(4).standard_normal(
            (2, v.shape[1], NH * HD)).astype(np.float32))
        got = ms_deform_attn_encoder_bwd_pallas(v, small_shapes, l, a, g)
        import jax as _jax
        _, vjp = _jax.vjp(
            lambda vv, ll, aa: ms_deform_attn_core_jnp(vv, small_shapes,
                                                       ll, aa), v, l, a)
        want = vjp(g)
        errs = [float(jnp.max(jnp.abs(x.astype(jnp.float32)
                                      - y.astype(jnp.float32))))
                for x, y in zip(got, want)]
        print(f"bwd parity (tiny): dV={errs[0]:.2e} dLoc={errs[1]:.2e} "
              f"dAw={errs[2]:.2e}", flush=True)

        gq = jnp.asarray(np.random.default_rng(5).standard_normal(
            (args.batch, inputs[0].shape[1], NH * HD)).astype(np.float32))

        def bwd_fn(v_, l_, a_):
            outs = ms_deform_attn_encoder_bwd_pallas(v_, shapes, l_, a_, gq)
            # sum ALL outputs so XLA cannot dead-code any of the kernels
            return (outs[0].astype(jnp.float32).sum() + outs[1].sum()
                    + outs[2].sum())

        tb = scan_time(lambda v_, l_, a_: bwd_fn(v_, l_, a_), inputs,
                       reps=args.reps)
        print(f"pallas backward: {tb * 1e3:.2f} ms/call "
              f"({tb * 1e3 / args.batch:.2f} ms/img)", flush=True)

    if not args.no_jnp:
        t2 = scan_time(lambda v, l, a: ms_deform_attn_core_jnp(v, shapes, l, a),
                       inputs, reps=max(1, args.reps // 4))
        print(f"jnp core:      {t2 * 1e3:.2f} ms/call "
              f"({t2 * 1e3 / args.batch:.2f} ms/img)  "
              f"speedup={t2 / t:.1f}x", flush=True)


if __name__ == "__main__":
    main()
