"""Single-image inference demo — reference demo/image_demo.py +
mmseg/apis/inference.py equivalent (init_segmentor / inference_segmentor /
show_result).

Usage:
  python tools/image_demo.py <preset> <image> [--ckpt pub.msgpack]
      [--out pred.png] [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("preset")
    p.add_argument("image")
    p.add_argument("--ckpt", default=None, help="published .msgpack params")
    p.add_argument("--out", default="pred.png")
    p.add_argument("--uncertainty", default=None, metavar="PNG",
                   help="also save a per-pixel uncertainty heatmap (across-"
                        "hypothesis variance of the randsteps ensemble, "
                        "ddp.py:219,241-245 machinery)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ddp_tpu.config import build_model, get_config
    from ddp_tpu.data.seg_datasets import PALETTES, normalize_image

    cfg = get_config(args.preset)
    model = build_model(cfg.model)
    img = np.asarray(Image.open(args.image).convert("RGB"), np.float32)
    x = jnp.asarray(normalize_image(img))[None]

    if args.ckpt:
        from flax.serialization import msgpack_restore

        variables = msgpack_restore(open(args.ckpt, "rb").read())
    else:
        print("WARNING: no --ckpt given; using random init (smoke test only)")
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            x, jnp.zeros(x.shape[:3], jnp.int32), train=False)

    if args.uncertainty:
        probs, unc = model.apply(
            variables, x, method=model.sample_with_uncertainty,
            rngs={"diffusion": jax.random.PRNGKey(args.seed)})
        pred = jnp.argmax(probs, axis=-1)
        var = np.asarray(unc["variance"])[0]
        heat = np.clip(var / max(float(var.max()), 1e-12) * 255, 0,
                       255).astype(np.uint8)
        Image.fromarray(heat).save(args.uncertainty)
        print(f"saved {args.uncertainty} (mean variance {var.mean():.3e}, "
              f"mean entropy {float(np.asarray(unc['entropy']).mean()):.3f} nats)")
    else:
        pred = model.apply(variables, x, method=model.predict,
                           rngs={"diffusion": jax.random.PRNGKey(args.seed)})
    pred = np.asarray(pred)[0].astype(np.uint8)
    palette = PALETTES.get(cfg.data.dataset)
    if palette is not None:
        color = np.asarray(palette, np.uint8)[pred % len(palette)]
    else:
        rng = np.random.default_rng(0)
        lut = rng.integers(0, 255, (256, 3), dtype=np.uint8)
        color = lut[pred]
    Image.fromarray(color).save(args.out)
    print(f"saved {args.out} (classes present: {sorted(set(pred.reshape(-1).tolist()))[:20]})")


if __name__ == "__main__":
    main()
