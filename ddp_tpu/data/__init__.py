"""Data layer: datasets, pipelines, batch iterators (SURVEY.md §2.5).

``make_train_iter(cfg)`` is the single factory the training CLI and the
convergence harness share — it dispatches on (cfg.model.task,
cfg.data.dataset) the way the reference's registry-built dataloaders do
(mmseg/apis/train.py:101)."""
from __future__ import annotations


def make_train_iter(cfg):
    """Build the infinite train batch iterator for a Config.

    Multi-host: each process gets its rank's slice of every global batch
    (rank/world from the jax runtime), matching the
    make_array_from_process_local_data contract in parallel.mesh.shard_batch.
    """
    import jax

    rank, world = jax.process_index(), jax.process_count()
    if cfg.model.task == "controlnet":
        from .controlnet_data import (Fill50kDataset, SyntheticFill50k,
                                      controlnet_batch_iterator)

        if cfg.data.dataset == "synthetic":
            # procedural data is free: a wide index pool (vs the real
            # fill50k's 50k pairs) so the generator must interpolate
            # circle position/size rather than memorize (r4)
            ds = SyntheticFill50k(size=cfg.model.cn_image_size,
                                  length=20_000)
        else:
            # real PNG pairs (controlnet/tutorial_dataset.py contract)
            ds = Fill50kDataset(cfg.data.data_root,
                                size=cfg.model.cn_image_size)
            if len(ds) == 0:
                raise FileNotFoundError(
                    f"no fill50k prompt.json under {cfg.data.data_root}")
        return controlnet_batch_iterator(ds, cfg.data.batch_size,
                                         seed=cfg.runtime.seed,
                                         rank=rank, world=world)
    if cfg.model.task == "bev_fusion":
        from .bev_datasets import (NuScenesFusionDataset,
                                   SyntheticFusionDataset,
                                   fusion_batch_iterator)

        if cfg.data.dataset == "synthetic":
            ds = SyntheticFusionDataset(
                sparse_shape=cfg.model.bev_sparse_shape,
                caps=cfg.model.bev_voxel_caps,
                voxel_size=cfg.model.bev_voxel_size,
                num_cams=cfg.model.bev_num_cams,
                image_size=cfg.model.bev_image_size,
                out_grid=cfg.model.bev_out_grid,
                num_classes=cfg.model.num_classes,
                scope=cfg.model.bev_xbound[1], length=512)
        else:
            # nuScenes infos pkl (tools/prepare_nuscenes.py builds it from a
            # raw nuScenes tree) + lidar sweeps voxelized host-side
            ds = NuScenesFusionDataset(
                cfg.data.data_root, "train",
                image_size=cfg.data.crop_size,
                out_grid=cfg.model.bev_out_grid,
                sparse_shape=cfg.model.bev_sparse_shape,
                caps=cfg.model.bev_voxel_caps,
                voxel_size=cfg.model.bev_voxel_size,
                scope=cfg.model.bev_xbound[1])
            if len(ds) == 0:
                raise FileNotFoundError(
                    f"no nuScenes infos under {cfg.data.data_root}; run "
                    "tools/prepare_nuscenes.py on the raw tree first")
        return fusion_batch_iterator(ds, cfg.data.batch_size,
                                     seed=cfg.runtime.seed, mean=cfg.data.mean,
                                     std=cfg.data.std, rank=rank, world=world)
    if cfg.model.task == "bev":
        from .bev_datasets import (NuScenesBEVDataset, SyntheticBEVDataset,
                                   bev_batch_iterator)

        if cfg.data.dataset == "synthetic":
            # 512 train scenes (eval draws held-out indices): enough scene
            # diversity to force the geometric image->BEV solution rather
            # than memorization
            ds = SyntheticBEVDataset(num_cams=cfg.model.bev_num_cams,
                                     image_size=cfg.model.bev_image_size,
                                     out_grid=cfg.model.bev_out_grid,
                                     num_classes=cfg.model.num_classes,
                                     scope=cfg.model.bev_xbound[1],
                                     length=512)
        else:
            ds = NuScenesBEVDataset(cfg.data.data_root, "train",
                                    image_size=cfg.data.crop_size,
                                    out_grid=cfg.model.bev_out_grid)
            if len(ds) == 0:
                raise FileNotFoundError(
                    f"no nuScenes infos under {cfg.data.data_root}")
        return bev_batch_iterator(ds, cfg.data.batch_size,
                                  seed=cfg.runtime.seed, mean=cfg.data.mean,
                                  std=cfg.data.std, rank=rank, world=world,
                                  aug=True)
    if cfg.model.task == "depth":
        from .depth_datasets import (DepthDataset, SyntheticDepthDataset,
                                     depth_batch_iterator)

        if cfg.data.dataset == "synthetic":
            ds = SyntheticDepthDataset(size=cfg.data.crop_size,
                                       max_depth=cfg.model.max_depth)
        else:
            ds = DepthDataset(cfg.data.data_root, "train", cfg.data.dataset)
            if len(ds) == 0:
                raise FileNotFoundError(
                    f"no data for {cfg.data.dataset} under {cfg.data.data_root}")
        return depth_batch_iterator(ds, cfg.data.batch_size,
                                    cfg.data.crop_size, seed=cfg.runtime.seed,
                                    mean=cfg.data.mean, std=cfg.data.std,
                                    rank=rank, world=world)
    # seg (and controlnet uses its own loader)
    from .seg_datasets import SegDataset, SyntheticSegDataset, seg_batch_iterator

    if cfg.data.dataset == "synthetic":
        ds = SyntheticSegDataset(num_classes=cfg.model.num_classes,
                                 size=cfg.data.crop_size)
    else:
        ds = SegDataset(cfg.data.data_root, "train", cfg.data.dataset)
        if len(ds) == 0:
            raise FileNotFoundError(
                f"no data found for {cfg.data.dataset} under {cfg.data.data_root}")
    return seg_batch_iterator(
        ds, cfg.data.batch_size, cfg.data.crop_size, seed=cfg.runtime.seed,
        mean=cfg.data.mean, std=cfg.data.std, ratio_range=cfg.data.ratio_range,
        cat_max_ratio=cfg.data.cat_max_ratio, flip_prob=cfg.data.flip_prob,
        rank=rank, world=world,
    )
