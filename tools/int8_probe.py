"""int8 / fp8 decoder-matmul probe on the real chip (VERDICT r5 lever c).

Times the decoder's dominant matmul shapes (FFN in/out, qkv+proj at the
flagship 65k-token geometry) in bf16 vs int8 (dot_general with s32
accumulation) vs fp8-e4m3 where the backend supports it. This bounds the
quantization speedup BEFORE building quantized training: if the matmuls
are a minor share of the step (decoder_microbench showed bf16 == f32,
i.e. layout-bound), int8 cannot buy much.

Writes work_dirs/int8_probe.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, *args, iters=20):
    # sub-ms kernels: the relay RTT is ~ms, so the delta window must span
    # hundreds of iterations to resolve them
    def run(n):
        t0 = time.perf_counter()
        float(fn(*args, n))
        return time.perf_counter() - t0

    run(1)
    t_small = run(2)
    t_big = run(2 + iters)
    return max((t_big - t_small) / iters, 1e-9)


def bench_matmul(m, k, n, dtype, iters=1000):
    rng = np.random.RandomState(0)
    if dtype == "int8":
        a = jnp.asarray(rng.randint(-127, 127, (m, k)), jnp.int8)
        b = jnp.asarray(rng.randint(-127, 127, (k, n)), jnp.int8)
        acc = jnp.int32
    elif dtype == "fp8":
        a = jnp.asarray(rng.randn(m, k), jnp.float8_e4m3fn)
        b = jnp.asarray(rng.randn(k, n), jnp.float8_e4m3fn)
        acc = jnp.float32
    else:
        a = jnp.asarray(rng.randn(m, k), dtype)
        b = jnp.asarray(rng.randn(k, n), dtype)
        acc = jnp.float32

    @jax.jit
    def run_n(a, b, n_it):
        def body(i, carry):
            s, aa = carry
            out = jax.lax.dot_general(aa, b, (((1,), (0,)), ((), ())),
                                      preferred_element_type=acc)
            # data dependence through a FULL reduction of out, fed back
            # into ONE element of a: anything narrower (a column slice)
            # lets XLA shrink the dot's n, and a provably-zero feedback
            # (chk*0) lets it hoist the whole body out of the loop — both
            # published absurd EFLOP "results" before this form. The
            # reduce adds ~0.08 ms of HBM traffic, identically per dtype.
            chk = jnp.sum(out).astype(jnp.float32)
            aa = aa.at[0, 0].add((chk % 3.0).astype(aa.dtype))
            return (s + chk, aa)

        s, _ = jax.lax.fori_loop(0, n_it, body, (jnp.float32(0), a))
        return s

    per = _timed(run_n, a, b, iters=iters)
    flops = 2.0 * m * k * n
    return per * 1e3, flops / per / 1e12


def main():
    out = {"chip": jax.devices()[0].device_kind, "rows": {}}
    shapes = {
        "ffn_in_65k": (65536, 256, 1024),
        "ffn_out_65k": (65536, 1024, 256),
        "qkv_65k": (65536, 256, 768),
    }
    for name, (m, k, n) in shapes.items():
        row = {}
        for dt_name, dt in (("bf16", jnp.bfloat16), ("int8", "int8"),
                            ("fp8", "fp8")):
            try:
                ms, tflops = bench_matmul(m, k, n, dt)
                row[dt_name] = {"ms": round(ms, 3),
                                "tflops_per_s": round(tflops, 1)}
            except Exception as e:
                row[dt_name] = {"error": f"{type(e).__name__}"}
            print(f"{name} {dt_name}: {row[dt_name]}", flush=True)
        out["rows"][name] = row
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "work_dirs", "int8_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
