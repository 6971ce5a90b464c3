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

    from ddp_tpu.train.loop import train

    if cfg.model.task == "bev_fusion":
        from ddp_tpu.data.bev_datasets import (SyntheticFusionDataset,
                                               fusion_batch_iterator)

        if cfg.data.dataset != "synthetic":
            raise NotImplementedError(
                "nuScenes fusion loading needs the lidar sweep files; "
                "preprocess with tools/prepare_nuscenes.py (synthetic works)")
        ds = SyntheticFusionDataset(
            sparse_shape=cfg.model.bev_sparse_shape,
            caps=cfg.model.bev_voxel_caps,
            voxel_size=cfg.model.bev_voxel_size,
            image_size=cfg.model.bev_image_size,
            out_grid=cfg.model.bev_out_grid,
            num_classes=cfg.model.num_classes,
            scope=cfg.model.bev_xbound[1])
        it = fusion_batch_iterator(ds, cfg.data.batch_size,
                                   seed=cfg.runtime.seed, mean=cfg.data.mean,
                                   std=cfg.data.std)
    elif cfg.model.task == "bev":
        from ddp_tpu.data.bev_datasets import (NuScenesBEVDataset,
                                               SyntheticBEVDataset,
                                               bev_batch_iterator)

        if cfg.data.dataset == "synthetic":
            ds = SyntheticBEVDataset()
        else:
            ds = NuScenesBEVDataset(cfg.data.data_root, "train",
                                    image_size=cfg.data.crop_size)
            if len(ds) == 0:
                raise FileNotFoundError(
                    f"no nuScenes infos under {cfg.data.data_root}")
        it = bev_batch_iterator(ds, cfg.data.batch_size, seed=cfg.runtime.seed,
                                mean=cfg.data.mean, std=cfg.data.std)
    elif cfg.model.task == "depth":
        from ddp_tpu.data.depth_datasets import (DepthDataset,
                                                 SyntheticDepthDataset,
                                                 depth_batch_iterator)

        if cfg.data.dataset == "synthetic":
            ds = SyntheticDepthDataset(size=cfg.data.crop_size,
                                       max_depth=cfg.model.max_depth)
        else:
            ds = DepthDataset(cfg.data.data_root, "train", cfg.data.dataset)
            if len(ds) == 0:
                raise FileNotFoundError(
                    f"no data for {cfg.data.dataset} under {cfg.data.data_root}")
        it = depth_batch_iterator(ds, cfg.data.batch_size, cfg.data.crop_size,
                                  seed=cfg.runtime.seed, mean=cfg.data.mean,
                                  std=cfg.data.std)
    else:
        from ddp_tpu.data.seg_datasets import (SegDataset, SyntheticSegDataset,
                                               seg_batch_iterator)

        if cfg.data.dataset == "synthetic":
            ds = SyntheticSegDataset(num_classes=cfg.model.num_classes,
                                     size=cfg.data.crop_size)
        else:
            ds = SegDataset(cfg.data.data_root, "train", cfg.data.dataset)
            if len(ds) == 0:
                raise FileNotFoundError(
                    f"no data found for {cfg.data.dataset} under {cfg.data.data_root}")
        it = seg_batch_iterator(
            ds, cfg.data.batch_size, cfg.data.crop_size, seed=cfg.runtime.seed,
            mean=cfg.data.mean, std=cfg.data.std, ratio_range=cfg.data.ratio_range,
            cat_max_ratio=cfg.data.cat_max_ratio, flip_prob=cfg.data.flip_prob,
        )
    train(cfg, it, resume=args.resume)


if __name__ == "__main__":
    main()
