"""ControlNet sampling demo — the reference's gradio_seg2image_ddp.py surface
(controlnet/gradio_seg2image_ddp.py: process() → DDIM + CFG samples from a
control hint + prompt) as a headless CLI, TPU-jitted end to end.

Examples:
  # sample from the synthetic fill50k rig with the converge_controlnet ckpt
  python tools/control_demo.py --preset converge_controlnet --index 3 \
      --num-samples 4 --steps 20 --scale 9.0 --out demo_cn.png

  # custom hint image + prompt
  python tools/control_demo.py --preset controlnet_sd15 \
      --hint hint.png --prompt "red circle with blue background"
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def save_grid(imgs: np.ndarray, path: str):
    """Tile [n, H, W, 3] uint8 into one row and save (PIL, else raw .npy)."""
    n, h, w, _ = imgs.shape
    grid = imgs.transpose(1, 0, 2, 3).reshape(h, n * w, 3)
    try:
        from PIL import Image

        Image.fromarray(grid).save(path)
    except ImportError:  # pragma: no cover
        np.save(path + ".npy", grid)
        path += ".npy"
    print(f"wrote {path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="converge_controlnet")
    p.add_argument("--workdir", default=None,
                   help="checkpoint dir (default: preset workdir)")
    p.add_argument("--hint", default=None, help="hint image path (else "
                   "synthetic fill50k sample --index)")
    p.add_argument("--prompt", default=None)
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--num-samples", type=int, default=4)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--scale", type=float, default=9.0,
                   help="classifier-free guidance scale")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="control_demo.png")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from ddp_tpu.config import build_model, get_config
    from ddp_tpu.data.controlnet_data import MAX_LEN, SyntheticFill50k, tokenize
    from ddp_tpu.train.checkpoint import CheckpointManager
    from ddp_tpu.train.optim import make_optimizer
    from ddp_tpu.train.state import TrainState

    cfg = get_config(args.preset)
    # a trained run persists its measured latent scale (scale.json); the
    # demo must rebuild the model with the SAME scaling
    sj = os.path.join(args.workdir or cfg.runtime.workdir, "scale.json")
    if os.path.exists(sj):
        import dataclasses
        import json

        with open(sj) as f:
            sf = json.load(f)["cn_scale_factor"]
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, cn_scale_factor=sf))
        print(f"using measured cn_scale_factor {sf:.5f}")
    model = build_model(cfg.model)
    size = cfg.model.cn_image_size

    if args.hint:
        from PIL import Image

        hint = np.asarray(Image.open(args.hint).convert("RGB").resize(
            (size, size)), np.float32) / 255.0
        ids = tokenize(args.prompt or "")
    else:
        sample = SyntheticFill50k(size=size).load(args.index)
        hint = sample["hint"]
        # default to the dataset's own prompt for this hint
        ids = tokenize(args.prompt) if args.prompt else sample["ids"]
    uncond = tokenize("")

    # restore params through the standard TrainState/checkpoint contract
    init_rngs = {"params": jax.random.PRNGKey(0),
                 "diffusion": jax.random.PRNGKey(1),
                 "dropout": jax.random.PRNGKey(2)}
    img0 = jnp.zeros((1, size, size, 3), jnp.float32)
    hint0 = jnp.zeros((1, size, size, 3), jnp.float32)
    ids0 = jnp.zeros((1, MAX_LEN), jnp.int32)
    variables = model.init(init_rngs, img0, hint0, ids0, train=False)
    ckpt = CheckpointManager(args.workdir or cfg.runtime.workdir)
    if ckpt.latest_step() is not None:
        tx = make_optimizer(cfg.optim, variables["params"])
        tmpl = TrainState.create(variables["params"], tx,
                                 variables.get("batch_stats", {}))
        state = ckpt.restore(jax.device_get(tmpl))
        variables = {"params": state.params}
        print(f"restored step {int(state.step)}")
    else:
        print("WARNING: no checkpoint found — sampling from random init")

    n = args.num_samples
    hints = jnp.asarray(np.broadcast_to(hint, (n, *hint.shape)))
    ids_b = jnp.asarray(np.broadcast_to(ids, (n, MAX_LEN)))
    unc_b = jnp.asarray(np.broadcast_to(uncond, (n, MAX_LEN)))

    @jax.jit
    def sample_fn(variables, hints, ids_b, unc_b, rng):
        return model.apply(variables, hints, ids_b, unc_b,
                           steps=args.steps, guidance_scale=args.scale,
                           method=model.sample, rngs={"diffusion": rng})

    imgs = sample_fn(variables, hints, ids_b, unc_b,
                     jax.random.PRNGKey(args.seed))
    imgs = np.asarray(jnp.clip((imgs + 1.0) * 127.5, 0, 255)).astype(np.uint8)
    save_grid(imgs, args.out)


if __name__ == "__main__":
    main()
