"""Training CLI — reference segmentation/tools/train.py equivalent.

Usage:
  python tools/train.py <preset> [--workdir DIR] [--resume]
       [--yaml overlay.yaml] [--set model.bit_scale=0.1 optim.lr=1e-4 ...]

Presets mirror the reference DDP config files (ddp_tpu/config.py PRESETS).
Multi-host: run the same command on every host with jax.distributed env set;
the mesh spans all devices automatically.
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="ddp_tpu trainer")
    p.add_argument("preset")
    p.add_argument("--workdir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--yaml", default=None)
    p.add_argument("--set", nargs="*", default=[], metavar="K=V")
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() (multi-host)")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu'); needed because the "
                        "hosting sitecustomize may pin a TPU relay backend")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.distributed:
        jax.distributed.initialize()

    from ddp_tpu.config import apply_overrides, get_config, load_yaml_overlay

    cfg = get_config(args.preset)
    if args.yaml:
        cfg = load_yaml_overlay(cfg, args.yaml)
    overrides = dict(kv.split("=", 1) for kv in args.set)
    if args.workdir:
        overrides["runtime.workdir"] = args.workdir
    cfg = apply_overrides(cfg, overrides)
    os.makedirs(cfg.runtime.workdir, exist_ok=True)

    from ddp_tpu.data import make_train_iter
    from ddp_tpu.train.loop import train

    it = make_train_iter(cfg)
    train(cfg, it, resume=args.resume)


if __name__ == "__main__":
    main()
