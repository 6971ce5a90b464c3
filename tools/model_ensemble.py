"""Ensemble evaluation — reference tools/model_ensemble.py equivalent.

Averages softmax probabilities of the same preset restored from several
checkpoints (published .msgpack or workdirs) and evaluates mIoU.

Usage:
  python tools/model_ensemble.py <preset> ckpt1.msgpack ckpt2.msgpack \
      [--limit N] [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_params(path):
    from flax.serialization import msgpack_restore

    with open(path, "rb") as f:
        return msgpack_restore(f.read())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("preset")
    p.add_argument("ckpts", nargs="+")
    p.add_argument("--limit", type=int, default=None)
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
    from ddp_tpu.evaluation.metrics import SegMetricAccumulator

    cfg = get_config(args.preset)
    model = build_model(cfg.model)
    all_vars = [load_params(c) for c in args.ckpts]

    @jax.jit
    def probs_fn(variables, img, rng):
        return model.apply(variables, img, method=model.sample,
                           rngs={"diffusion": rng})

    ds = build_eval_dataset(cfg.data)
    acc = SegMetricAccumulator(cfg.model.num_classes)
    rng = jax.random.PRNGKey(args.seed)
    for i, sample in enumerate(ds):
        if args.limit is not None and i >= args.limit:
            break
        img = jnp.asarray(sample["image"])[None]
        prob = None
        for j, v in enumerate(all_vars):
            r = jax.random.fold_in(rng, i * 997 + j)
            pj = probs_fn(v, img, r)
            prob = pj if prob is None else prob + pj
        pred = np.asarray(jnp.argmax(prob, axis=-1))[0]
        acc.update(pred, sample["label"])
    print(acc.summary())


if __name__ == "__main__":
    main()
