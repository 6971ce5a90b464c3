"""Isolated encoder (Swin-T + FPN + merge) microbenchmark on the real chip.

The r4 subtraction profile measured "encoder backward" at 12.8 ms by
freezing it, but never isolated the encoder FORWARD — fwd_only was 99.8 ms
of which the decoder explains 28.8 and the CE ~20, leaving ~50 ms
unattributed. Swin's 7x7-window attention has the same tiny-per-head-matmul
shape the decoder microbench showed to be layout-bound; this tool measures
extract_feat alone (fwd and fwd+bwd) so the r5 notes can attribute the
remaining step time with evidence.

Writes work_dirs/encoder_microbench.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _timed_loop(fn, *args, iters=8):
    def timed(n):
        t0 = time.perf_counter()
        float(fn(*args, n))
        return time.perf_counter() - t0

    for attempt in range(3):
        try:
            timed(1)
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(5)
    t_small = timed(2)
    t_big = timed(2 + iters)
    return max((t_big - t_small) / iters, 1e-9)


def bench(batch=4, size=512, mode="fwd", dtype=jnp.bfloat16):
    from ddp_tpu.core.diffusion import DiffusionConfig
    from ddp_tpu.models.segmentor import DDPSegmentor

    model = DDPSegmentor(
        num_classes=150, backbone_type="swin", backbone_variant="tiny",
        diffusion=DiffusionConfig(timesteps=3, randsteps=1),
        drop_path_rate=0.0, decoder_attn="window")
    img0 = jnp.zeros((1, size, size, 3), jnp.float32)
    gt0 = jnp.zeros((1, size, size), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, img0, gt0, train=False)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, variables)
    img = jnp.asarray(np.random.RandomState(0).randn(batch, size, size, 3),
                      dtype)

    if mode == "fwd":

        @jax.jit
        def run_n(v, img, n):
            def body(i, acc):
                feat = model.apply(v, img + acc * 0,
                                   method=model.extract_feat)
                return acc + jnp.sum(feat).astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    else:

        @jax.jit
        def run_n(v, img, n):
            def loss_fn(p, im):
                feat = model.apply({"params": p}, im,
                                   method=model.extract_feat)
                return jnp.mean(feat.astype(jnp.float32) ** 2)

            def body(i, acc):
                l, g = jax.value_and_grad(loss_fn)(variables["params"],
                                                   img + acc * 0)
                gsum = jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)),
                    g, jnp.float32(0))
                return acc + l + gsum * 1e-12

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    return _timed_loop(run_n, variables, img) * 1e3


def main():
    out = {"chip": jax.devices()[0].device_kind, "rows": {}}
    for name, kw in (("fwd_b4", dict(batch=4, mode="fwd")),
                     ("train_b4", dict(batch=4, mode="train"))):
        try:
            ms = bench(**kw)
            out["rows"][name] = {"ms": round(ms, 2), "batch": kw["batch"],
                                 "ms_per_img": round(ms / kw["batch"], 2)}
            print(f"{name}: {ms:.2f} ms", flush=True)
        except Exception as e:
            out["rows"][name] = {"error": type(e).__name__}
            print(f"{name}: ERROR {type(e).__name__}", flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "work_dirs", "encoder_microbench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
