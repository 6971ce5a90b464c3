"""Confusion matrix over a validation set — reference tools/confusion_matrix.py.

Usage: python tools/confusion_matrix.py <preset> [--ckpt pub.msgpack]
    [--limit N] [--out cm.npy] [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("preset")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--out", default="confusion_matrix.npy")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from ddp_tpu.config import build_model, get_config
    from ddp_tpu.data.seg_datasets import build_eval_dataset

    cfg = get_config(args.preset)
    k = cfg.model.num_classes
    model = build_model(cfg.model)
    if args.ckpt:
        from flax.serialization import msgpack_restore

        variables = msgpack_restore(open(args.ckpt, "rb").read())
    else:
        print("WARNING: random init (smoke test only)")
        import jax.numpy as jnp2

        dummy = jnp2.zeros((1, cfg.data.crop_size[0], cfg.data.crop_size[1], 3))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            dummy, jnp2.zeros(dummy.shape[:3], jnp2.int32), train=False)

    predict = jax.jit(lambda v, x, r: model.apply(
        v, x, method=model.predict, rngs={"diffusion": r}))

    cm = np.zeros((k, k), np.int64)
    for i, sample in enumerate(build_eval_dataset(cfg.data)):
        if args.limit is not None and i >= args.limit:
            break
        x = jnp.asarray(sample["image"])[None]
        pred = np.asarray(predict(variables, x,
                                  jax.random.fold_in(jax.random.PRNGKey(args.seed), i)))[0]
        gt = sample["label"]
        valid = gt != 255
        idx = gt[valid] * k + pred[valid]
        cm += np.bincount(idx.reshape(-1), minlength=k * k).reshape(k, k)

    np.save(args.out, cm)
    acc = np.diag(cm).sum() / max(cm.sum(), 1)
    per_class = np.diag(cm) / np.maximum(cm.sum(1), 1)
    print(f"saved {args.out}; aAcc {acc:.4f}  mAcc {np.nanmean(per_class):.4f}")


if __name__ == "__main__":
    main()
