"""Round-4 diagnosis of the bev_fusion 1-step collapse (VERDICT r3 weak #3).

Probes, all on the committed r3 checkpoint:
  1. train-set vs held-out eval at 1/3-step  -> memorization gap?
  2. branch ablations (zero lidar voxels / zero camera images) -> which
     branch carries the prediction?
Writes work_dirs/converge_bev_fusion/diagnosis.json.
"""
import dataclasses as dc
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ddp_tpu.config import build_model, get_config
from ddp_tpu.data.bev_datasets import FUSION_BATCH_KEYS, SyntheticFusionDataset
from ddp_tpu.evaluation.metrics import bev_map_iou
from run_convergence import _restore_variables

N_EVAL, EVAL_BATCH = 16, 8


def eval_at(variables, mc, base, T, zero_lidar=False, zero_cam=False,
            seed=0):
    ds = SyntheticFusionDataset(
        sparse_shape=mc.bev_sparse_shape, caps=mc.bev_voxel_caps,
        voxel_size=mc.bev_voxel_size, num_cams=mc.bev_num_cams,
        image_size=mc.bev_image_size, out_grid=mc.bev_out_grid,
        num_classes=mc.num_classes, scope=mc.bev_xbound[1])
    mean = np.asarray((123.675, 116.28, 103.53), np.float32)
    std = np.asarray((58.395, 57.12, 57.375), np.float32)
    arg_keys = FUSION_BATCH_KEYS[:-1]
    model = build_model(dc.replace(
        mc, diffusion=dc.replace(mc.diffusion, timesteps=T)))

    @jax.jit
    def predict(variables, args, rng):
        return model.apply(variables, *args, method=model.sample,
                           rngs={"diffusion": rng})

    rng = jax.random.PRNGKey(seed)
    scores, gts = [], []
    for s0 in range(0, N_EVAL, EVAL_BATCH):
        samples = []
        for i in range(s0, s0 + EVAL_BATCH):
            s = ds.load(base + i)
            s["image"] = (s["image"] - mean) / std
            samples.append(s)
        batch = {}
        for k in arg_keys:
            if k == "rulebooks":
                batch[k] = {kk: jnp.asarray(np.stack([s[k][kk] for s in samples]))
                            for kk in samples[0][k]}
            else:
                batch[k] = jnp.asarray(np.stack([s[k] for s in samples]))
        if zero_lidar:
            batch["voxel_feats"] = jnp.zeros_like(batch["voxel_feats"])
        if zero_cam:
            batch["image"] = jnp.zeros_like(batch["image"])
        sc = predict(variables, [batch[k] for k in arg_keys],
                     jax.random.fold_in(rng, s0))
        scores.append(np.asarray(sc))
        gts.append(np.stack([s["label"] for s in samples]))
    sc = np.concatenate(scores).transpose(0, 3, 1, 2)
    gt = np.concatenate(gts).transpose(0, 3, 1, 2)
    return bev_map_iou(sc, gt)["mIoU"]


def main():
    cfg = get_config("converge_bev_fusion")
    variables, step = _restore_variables(cfg)
    print(f"restored step {step}", flush=True)
    out = {"ckpt_step": step}
    for name, base in (("train", 0), ("heldout", 100_000)):
        for T in (1, 3):
            m = eval_at(variables, cfg.model, base, T)
            out[f"{name}_mIoU@{T}"] = round(float(m), 4)
            print(f"{name} T={T}: {m:.4f}", flush=True)
    for abl, kw in (("zero_lidar", {"zero_lidar": True}),
                    ("zero_cam", {"zero_cam": True})):
        m = eval_at(variables, cfg.model, 100_000, 3, **kw)
        out[f"heldout_mIoU@3_{abl}"] = round(float(m), 4)
        print(f"heldout T=3 {abl}: {m:.4f}", flush=True)
    path = os.path.join(cfg.runtime.workdir, "diagnosis.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
