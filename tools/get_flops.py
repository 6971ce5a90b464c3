"""FLOPs / parameter counter — reference tools/get_flops.py equivalent.

Uses XLA's own cost analysis of the lowered forward program (exact for the
compiled graph, unlike the reference's per-module mmcv counter).

Usage: python tools/get_flops.py <preset> [--size 512] [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("preset")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--platform", default="cpu",
                   help="cost analysis does not need the TPU; default cpu")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from ddp_tpu.config import build_model, get_config

    cfg = get_config(args.preset)
    model = build_model(cfg.model)
    img = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)
    gt = jnp.zeros((args.batch, args.size, args.size), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, img, gt, train=False)

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))

    def fwd(v, img):
        return model.apply(v, img, method=model.sample,
                           rngs={"diffusion": jax.random.PRNGKey(7)})

    lowered = jax.jit(fwd).lower(variables, img)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan"))
    bytes_ = cost.get("bytes accessed", float("nan"))
    print(f"preset:            {args.preset}")
    print(f"input:             {args.batch}x{args.size}x{args.size}x3")
    print(f"params:            {n_params / 1e6:.2f} M")
    print(f"forward flops:     {flops / 1e9:.2f} GFLOPs "
          f"(full {cfg.model.diffusion.timesteps}-step rollout)")
    print(f"bytes accessed:    {bytes_ / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
