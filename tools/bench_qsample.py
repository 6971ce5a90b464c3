"""Measure the fused q_sample Pallas kernel vs the XLA fallback on TPU.

Flagship shapes (ADE Swin-T 512x512 train step): N = B*128*128 rows,
K = 151 classes, C = 256 channels. Reports ms/call for:
  encode  — embed+squash (the per-rollout-step re-embed, 3x per inference)
  qsample — embed+squash+corrupt (once per train step)
  grad    — d/d(table) of sum(qsample²) (train backward)

Results recorded in ddp_tpu/ops/pallas/qsample_notes.md.
Usage: python tools/bench_qsample.py [--batch 8] [--dtype f32|bf16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed_loop(fn, *args, iters=20):
    """fn takes an int32 scalar `i` and must USE it (e.g. roll labels by i) —
    otherwise XLA hoists the loop-invariant body and the delta measures
    nothing (observed: negative ms on the hoisted qsample)."""
    @jax.jit
    def loop(n, *a):
        def body(i, acc):
            return acc + jnp.sum(fn(i, *a)).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def t(n):
        t0 = time.perf_counter()
        float(loop(n, *args))
        return time.perf_counter() - t0

    t(1)
    a = t(2)
    b = t(2 + iters)
    return (b - a) / iters * 1000.0  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--classes", type=int, default=151)
    p.add_argument("--channels", type=int, default=256)
    p.add_argument("--hw", type=int, default=128)
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    args = p.parse_args()

    from ddp_tpu.ops.pallas import q_sample as Q

    dtype = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    n = args.batch * args.hw * args.hw
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, args.classes, n), jnp.int32)
    table = jnp.asarray(rng.randn(args.classes, args.channels), dtype)
    alpha = jnp.asarray(rng.uniform(0.1, 1.0, n), jnp.float32)
    sigma = jnp.sqrt(1.0 - alpha ** 2)
    noise = jnp.asarray(rng.randn(n, args.channels), dtype)
    bs = 0.01

    print(f"backend={jax.default_backend()} N={n} K={args.classes} "
          f"C={args.channels} dtype={args.dtype}", flush=True)

    results = {}
    def lab(i):
        return jnp.roll(labels, i)  # loop-variant input, O(N) shift

    for name, fn in (
        ("encode_pallas", lambda i: Q._encode_pallas(lab(i), table, bs)),
        ("encode_xla", lambda i: Q.encode_map_xla(lab(i), table, bs)),
        ("qsample_pallas", lambda i: Q._qsample_pallas(lab(i), table, bs,
                                                       alpha, sigma, noise)),
        ("qsample_xla", lambda i: Q.q_sample_xla(lab(i), table, bs,
                                                 alpha, sigma, noise)),
    ):
        ms = timed_loop(fn)
        results[name] = ms
        print(f"{name:16s} {ms:8.3f} ms/call", flush=True)

    # backward: d(table) only (the trained parameter)
    os.environ["DDP_TPU_FUSED_QSAMPLE"] = "1"

    def g_fused(i, tb):
        return jax.grad(lambda t: jnp.sum(
            Q.fused_q_sample(lab(i), t, bs, alpha, sigma, noise) ** 2))(tb)

    os.environ["DDP_TPU_FUSED_QSAMPLE"] = "0"

    def g_xla(i, tb):
        return jax.grad(lambda t: jnp.sum(
            Q.q_sample_xla(lab(i), t, bs, alpha, sigma, noise) ** 2))(tb)

    del os.environ["DDP_TPU_FUSED_QSAMPLE"]
    for name, fn in (("grad_fused", g_fused), ("grad_xla", g_xla)):
        ms = timed_loop(fn, table, iters=10)
        results[name] = ms
        print(f"{name:16s} {ms:8.3f} ms/call", flush=True)

    fwd_speedup = results["qsample_xla"] / results["qsample_pallas"]
    enc_speedup = results["encode_xla"] / results["encode_pallas"]
    print(f"\nencode speedup:  {enc_speedup:.2f}x")
    print(f"qsample speedup: {fwd_speedup:.2f}x")
    print(f"grad speedup:    {results['grad_xla'] / results['grad_fused']:.2f}x")


if __name__ == "__main__":
    main()
