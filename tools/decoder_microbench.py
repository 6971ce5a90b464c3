"""Isolated window-decoder microbenchmark on the real chip.

The r4 breakdown (ops/pallas/train_profile_notes.md) leaves ~58% of the
flagship train step in "backward around the decoder's 16k-token layers"
without locating the waste inside the decoder. This tool times the 6-layer
TimeFiLMEncoder stack ALONE (no backbone, no loss) at the flagship token
geometry, forward and train (fwd+bwd+grad), across batch sizes and
ablations, with bench.py's on-device fori_loop delta-timing.

Speed-of-light context at [b4, 16384, 256] ffn 1024 win 8 bf16:
  decoder fwd matmul FLOPs ~= 6 layers * 65536 tok * 12.5 * 256^2 * 2
  ~= 1.29 TFLOP -> 6.5 ms at v5e peak 197 TFLOP/s; fwd+bwd ~3x that.
Everything above that is layout ops / HBM traffic / spills.

Usage: python tools/decoder_microbench.py [quick]
Writes work_dirs/decoder_microbench.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _timed_loop(fn, *args, iters=10):
    def timed(n):
        t0 = time.perf_counter()
        float(fn(*args, n))
        return time.perf_counter() - t0

    for attempt in range(3):
        try:
            timed(1)
            break
        except Exception as e:
            if attempt == 2:
                raise
            print(f"# compile retry ({type(e).__name__})", file=sys.stderr,
                  flush=True)
            time.sleep(5)
    t_small = timed(2)
    t_big = timed(2 + iters)
    return max((t_big - t_small) / iters, 1e-9)


def build(n_layers=6, use_time=True, film="v1", window=8, heads=8):
    from ddp_tpu.nn.transformer import TimeFiLMEncoder

    return TimeFiLMEncoder(num_layers=n_layers, embed_dims=256,
                           num_heads=heads, ffn_dim=1024, use_time=use_time,
                           attn_type="window", window=window, film=film)


def bench_case(batch, hw=128, n_layers=6, use_time=True, mode="train",
               dtype=jnp.bfloat16, iters=8, window=8, heads=8):
    enc = build(n_layers=n_layers, use_time=use_time, window=window,
                heads=heads)
    s = hw * hw
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(batch, s, 256), dtype)
    t = jnp.asarray(rng.randn(batch, 1024), dtype) if use_time else None
    pos = jnp.asarray(rng.randn(1, s, 256), dtype)
    shapes = ((hw, hw),)
    refs = jnp.zeros((s, 1, 2), dtype)
    variables = enc.init(jax.random.PRNGKey(0), q[:1], None if t is None
                         else t[:1], pos, refs, shapes)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, variables)

    if mode == "fwd":

        @jax.jit
        def run_n(v, q, t, n):
            def body(i, acc):
                out = enc.apply(v, q + acc * 0, t, pos, refs, shapes)
                return acc + jnp.sum(out).astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    else:

        @jax.jit
        def run_n(v, q, t, n):
            def loss_fn(p, qq):
                out = enc.apply({"params": p}, qq, t, pos, refs, shapes)
                return jnp.mean(out.astype(jnp.float32) ** 2)

            def body(i, acc):
                l, g = jax.value_and_grad(loss_fn)(variables["params"],
                                                   q + acc * 0)
                gsum = jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)),
                    g, jnp.float32(0))
                return acc + l + gsum * 1e-12

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    per = _timed_loop(run_n, variables, q, t, iters=iters)
    return per * 1e3


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    out = {"chip": jax.devices()[0].device_kind, "hw": 128, "embed": 256,
           "ffn": 1024, "layers": 6, "rows": {}}
    prev_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "work_dirs", "decoder_microbench.json")
    if os.path.exists(prev_path):
        try:
            out["rows"] = json.load(open(prev_path)).get("rows", {})
        except Exception:
            pass

    cases = [
        # (name, kwargs)
        ("fwd_b4", dict(batch=4, mode="fwd")),
        ("train_b1", dict(batch=1, mode="train")),
        ("train_b2", dict(batch=2, mode="train")),
        ("train_b4", dict(batch=4, mode="train")),
        ("train_b4_notime", dict(batch=4, mode="train", use_time=False)),
        ("train_b4_f32", dict(batch=4, mode="train", dtype=jnp.float32)),
        ("train_b8", dict(batch=8, mode="train")),
    ]
    if quick:
        cases = cases[:4]
    if len(sys.argv) > 1 and sys.argv[1] == "shape":
        # r5: the b4 row showed bf16==f32 -> not matmul-bound; probe bigger
        # MXU tiles (window 16 = 256-token windows; 4 heads = 64-dim heads)
        cases = [
            ("train_b4_w16", dict(batch=4, mode="train", window=16)),
            ("train_b4_h4", dict(batch=4, mode="train", heads=4)),
            ("train_b4_w16h4", dict(batch=4, mode="train", window=16,
                                    heads=4)),
            ("fwd_b4_w16h4", dict(batch=4, mode="fwd", window=16, heads=4)),
        ]
    for name, kw in cases:
        try:
            ms = bench_case(**kw)
            b = kw["batch"]
            out["rows"][name] = {
                "ms": round(ms, 2), "batch": b,
                "ms_per_img": round(ms / b, 2),
                "tokens": b * 128 * 128,
            }
            print(f"{name}: {ms:.2f} ms ({ms / b:.2f} ms/img)", flush=True)
        except Exception as e:
            out["rows"][name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(f"{name}: ERROR {type(e).__name__}", flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "work_dirs", "decoder_microbench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["rows"], indent=1))


if __name__ == "__main__":
    main()
