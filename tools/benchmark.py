"""Component benchmark — reference tools/benchmark.py equivalent, plus
per-component breakdown (backbone / decoder layer / deform-attn / full
rollout) using on-device fori_loop delta timing (relay-safe, see bench.py).

Usage: python tools/benchmark.py [--bf16] [--batch 4] [--size 512]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def depend(x, i):
    """Make ``x`` data-depend on loop counter ``i`` (runtime no-op) so XLA
    cannot hoist the loop body out as loop-invariant."""
    zero = jnp.where(i < 0, jnp.ones((), x.dtype), jnp.zeros((), x.dtype))
    return x + zero


def delta_time(fn, *args, iters=4):
    """Per-iteration seconds of fn, excluding dispatch/transfer overhead.

    ``fn(*args, i)`` MUST make its output depend on ``i`` (use ``depend`` on
    an input) — otherwise XLA's loop-invariant code motion computes the body
    once and the measurement is meaningless. The final ``float()`` forces a
    host transfer, which is the only honest synchronization through the
    remote-TPU relay (block_until_ready returns early there)."""

    @jax.jit
    def loop(n, *args):
        def body(i, acc):
            out = fn(*args, i)
            return acc + jnp.sum(out).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(loop(1, *args))  # compile+warm

    def timed(n):
        t0 = time.perf_counter()
        float(loop(n, *args))
        return time.perf_counter() - t0

    t_small = timed(1)
    t_big = timed(1 + iters)
    return max((t_big - t_small) / iters, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--only", default=None,
                    choices=["backbone", "denoise", "msda", "full"],
                    help="benchmark a single component (remote compiles are "
                         "slow; one program per invocation)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ddp_tpu.core.diffusion import DiffusionConfig
    from ddp_tpu.models.segmentor import DDPSegmentor
    from ddp_tpu.nn.heads import DeformableHeadWithTime
    from ddp_tpu.ops.deform_attn import ms_deform_attn

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    b, hw = args.batch, args.size
    model = DDPSegmentor(num_classes=150, backbone_type="swin",
                         backbone_variant="tiny",
                         diffusion=DiffusionConfig(timesteps=3),
                         drop_path_rate=0.0)
    img = jnp.zeros((b, hw, hw, 3), dtype)
    gt = jnp.zeros((b, hw, hw), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        img.astype(jnp.float32), gt, train=False)
    if args.bf16:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, variables)

    results = {}

    def want(name):
        return args.only is None or args.only == name

    # 1. backbone+neck only
    if want("backbone"):
        def backbone_fn(v, im, i):
            return model.apply(v, depend(im, i), train=False,
                               method=model.extract_feat)

        t = delta_time(backbone_fn, variables, img)
        results["backbone_ms"] = t * 1e3

    # 2. one full denoise (fuse + time mlp + 6-layer decoder + conv_seg)
    feat_hw = hw // 4
    x = jnp.zeros((b, feat_hw, feat_hw, 256), dtype)
    mask = jnp.zeros((b, feat_hw, feat_hw, 256), dtype)

    if want("denoise"):
        def denoise_fn(v, x, mask, i):
            log_snr = jnp.zeros((b,), dtype)
            return model.apply(v, depend(x, i), mask, log_snr, train=False,
                               method=model.denoise_logits)

        t = delta_time(denoise_fn, variables, x, mask)
        results["denoise_once_ms"] = t * 1e3

    # 3. raw deform-attn op at decoder shapes (S = (hw/4)^2 tokens)
    s = feat_hw * feat_hw
    val = jnp.zeros((b, s, 8, 32), dtype)
    loc = jnp.full((b, s, 8, 1, 4, 2), 0.5, dtype)
    wts = jnp.full((b, s, 8, 1, 4), 0.25, dtype)

    if want("msda"):
        def msda_fn(v, l, w, i):
            return ms_deform_attn(depend(v, i), ((feat_hw, feat_hw),), l, w)

        t = delta_time(msda_fn, val, loc, wts)
        results["msda_op_ms"] = t * 1e3

    # 4. full 3-step rollout (the bench.py headline)
    if want("full"):
        def full_fn(v, im, i):
            return model.apply(v, depend(im, i), method=model.sample,
                               rngs={"diffusion": jax.random.fold_in(
                                   jax.random.PRNGKey(7), i)})

        t = delta_time(full_fn, variables, img)
        results["full_rollout_ms"] = t * 1e3
        results["img_per_s"] = b / t
    results["dtype"] = "bf16" if args.bf16 else "f32"
    results["batch"] = b
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
