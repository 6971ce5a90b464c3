"""Evaluation CLI — reference segmentation/tools/test.py equivalent.

Runs whole-image or slide inference over a validation set and prints the
mIoU/aAcc/mAcc table (mmseg eval_metrics semantics).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="ddp_tpu evaluator")
    p.add_argument("preset")
    p.add_argument("--workdir", default=None, help="checkpoint dir to restore")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--limit", type=int, default=None, help="max eval images")
    p.add_argument("--seed", type=int, default=0, help="diffusion eval seed")
    p.add_argument("--seeds", type=int, default=1,
                   help="average metrics over N diffusion seeds (the "
                        "reference warns results vary with diffusion "
                        "randomness, segmentation/README.md:94)")
    p.add_argument("--set", nargs="*", default=[], metavar="K=V")
    p.add_argument("--uncertainty", action="store_true",
                   help="also report per-image ensemble uncertainty from "
                        "the randsteps hypotheses (seg: variance + "
                        "predictive entropy; depth: metric-depth std + "
                        "80% interval width; ddp.py:219)")
    p.add_argument("--platform", default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from ddp_tpu.config import apply_overrides, build_model, get_config
    from ddp_tpu.data.seg_datasets import SegDataset, SyntheticSegDataset
    from ddp_tpu.data.pipelines import normalize
    from ddp_tpu.evaluation.metrics import SegMetricAccumulator
    from ddp_tpu.evaluation.slide import slide_inference
    from ddp_tpu.train.checkpoint import CheckpointManager
    from ddp_tpu.train.optim import make_optimizer
    from ddp_tpu.train.state import TrainState

    cfg = get_config(args.preset, dict(kv.split("=", 1) for kv in args.set))
    model = build_model(cfg.model)

    if cfg.model.task == "depth":
        from ddp_tpu.data.depth_datasets import (DepthDataset,
                                                 SyntheticDepthDataset)

        if cfg.data.dataset == "synthetic":
            ds = SyntheticDepthDataset(cfg.data.crop_size,
                                       max_depth=cfg.model.max_depth)
        else:
            ds = DepthDataset(cfg.data.data_root, "test", cfg.data.dataset)
    elif cfg.data.dataset == "synthetic":
        ds = SyntheticSegDataset(cfg.model.num_classes, cfg.data.crop_size)
    else:
        ds = SegDataset(cfg.data.data_root, "val", cfg.data.dataset)
    n = min(len(ds), args.limit or len(ds))

    sample0 = ds.load(0)
    img0 = jnp.asarray(sample0["image"][None])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        img0, jnp.asarray(sample0["label"][None]), train=False,
    )
    workdir = args.workdir or cfg.runtime.workdir
    ckpt = CheckpointManager(workdir)
    if ckpt.latest_step() is not None:
        tx = make_optimizer(cfg.optim, variables["params"])
        tmpl = TrainState.create(variables["params"], tx,
                                 variables.get("batch_stats", {}))
        state = ckpt.restore(jax.device_get(tmpl), args.step)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        print(f"restored step {int(state.step)} from {workdir}")

    @jax.jit
    def predict(variables, img, rng):
        def fn(im):
            return model.apply(variables, im, method=model.sample,
                               rngs={"diffusion": rng})

        if cfg.runtime.test_mode == "slide":
            return slide_inference(fn, img, cfg.model.num_classes,
                                   cfg.runtime.test_crop, cfg.runtime.test_stride)
        return fn(img)

    rng = jax.random.PRNGKey(args.seed)
    if cfg.model.task == "depth":
        from ddp_tpu.data.depth_datasets import garg_crop_mask, nyu_eval_mask
        from ddp_tpu.evaluation.metrics import depth_metrics

        if args.uncertainty:

            @jax.jit
            def predict_depth_unc(variables, img, rng):
                return model.apply(variables, img,
                                   method=model.sample_with_uncertainty,
                                   rngs={"diffusion": rng})

        preds, gts, masks = [], [], []
        unc_std, unc_width = [], []
        for i in range(n):
            s = ds.load(i)
            s = normalize(s, cfg.data.mean, cfg.data.std)
            if args.uncertainty:
                d, unc = predict_depth_unc(
                    variables, jnp.asarray(s["image"][None]),
                    jax.random.fold_in(rng, i))
                unc_std.append(float(np.asarray(unc["std"]).mean()))
                unc_width.append(float(np.asarray(
                    unc["interval_high"] - unc["interval_low"]).mean()))
            else:
                d = predict(variables, jnp.asarray(s["image"][None]),
                            jax.random.fold_in(rng, i))
            preds.append(np.asarray(d[0]))
            gts.append(s["label"])
            shp = s["label"].shape
            if cfg.data.dataset in ("nyu", "sunrgbd"):
                # sunrgbd eval uses the same Eigen crop (sunrgbd.py eval_mask)
                masks.append(nyu_eval_mask(shp))
            elif cfg.data.dataset in ("kitti", "cityscapes"):
                masks.append(garg_crop_mask(shp))
            else:
                masks.append(np.ones(shp, bool))
        m = depth_metrics(np.stack(preds), np.stack(gts), np.stack(masks))
        print(" | ".join(f"{k} {v:.4f}" for k, v in m.items()) + f"  (n={n})")
        if args.uncertainty:
            print(f"mean hypothesis std {np.mean(unc_std):.4f} m | "
                  f"mean 80% interval width {np.mean(unc_width):.4f} m")
            if cfg.model.diffusion.randsteps == 1:
                print("  (randsteps=1: hypothesis std is trivially 0 — use "
                      "--set model.diffusion.randsteps=5)")
        return

    if args.uncertainty:
        if cfg.runtime.test_mode == "slide":
            raise SystemExit("--uncertainty supports whole-image mode only "
                             "(slide accumulates logits across crops; "
                             "per-crop hypothesis variance is not merged)")

        @jax.jit
        def predict_unc(variables, img, rng):
            return model.apply(variables, img,
                               method=model.sample_with_uncertainty,
                               rngs={"diffusion": rng})

    per_seed = []
    for si in range(args.seeds):
        rng_s = jax.random.PRNGKey(args.seed + si)
        acc = SegMetricAccumulator(cfg.model.num_classes)
        unc_var, unc_ent = [], []
        for i in range(n):
            s = ds.load(i)
            s = normalize(s, cfg.data.mean, cfg.data.std)
            if args.uncertainty:
                probs, unc = predict_unc(
                    variables, jnp.asarray(s["image"][None]),
                    jax.random.fold_in(rng_s, i))
                unc_var.append(float(np.asarray(unc["variance"]).mean()))
                unc_ent.append(float(np.asarray(unc["entropy"]).mean()))
            else:
                probs = predict(variables, jnp.asarray(s["image"][None]),
                                jax.random.fold_in(rng_s, i))
            pred = np.argmax(np.asarray(probs[0]), -1)
            acc.update(pred, s["label"])
            if (i + 1) % 50 == 0:
                print(f"[seed {args.seed + si}] eval {i + 1}/{n}", flush=True)
        m = acc.compute()
        per_seed.append(m)
        print(f"[seed {args.seed + si}] aAcc {m['aAcc'] * 100:.2f} | "
              f"mIoU {m['mIoU'] * 100:.2f} | mAcc {m['mAcc'] * 100:.2f}"
              f"  (n={n})")
        if args.uncertainty:
            print(f"[seed {args.seed + si}] mean ensemble variance "
                  f"{np.mean(unc_var):.3e} | mean predictive entropy "
                  f"{np.mean(unc_ent):.3f} nats")
            if cfg.model.diffusion.randsteps == 1:
                print("  (randsteps=1: ensemble variance is trivially 0 — "
                      "use --set model.diffusion.randsteps=5 for "
                      "hypothesis disagreement)")
    if args.seeds > 1:
        mious = [m["mIoU"] for m in per_seed]
        print(f"seed-averaged mIoU {np.mean(mious) * 100:.2f} "
              f"± {np.std(mious) * 100:.2f} over {args.seeds} seeds")


if __name__ == "__main__":
    main()
