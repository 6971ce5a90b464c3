"""Model export for deployment — the reference's tools/pytorch2onnx.py /
pytorch2torchscript.py equivalent, TPU-native: serializes the jitted forward
as portable StableHLO via jax.export (loadable from any XLA runtime — C++,
TF, IREE — without Python or flax).

Usage: python tools/export.py <preset> out.stablehlo [--size 512]
    [--ckpt pub.msgpack] [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("preset")
    p.add_argument("out")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--platform", default="cpu")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax import export as jexport

    from ddp_tpu.config import build_model, get_config

    cfg = get_config(args.preset)
    model = build_model(cfg.model)
    img = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)
    if args.ckpt:
        from flax.serialization import msgpack_restore

        variables = msgpack_restore(open(args.ckpt, "rb").read())
    else:
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            img, jnp.zeros(img.shape[:3], jnp.int32), train=False)

    # Close over the params so the artifact is self-contained (weights are
    # baked as constants, like an ONNX export).
    def fwd(x):
        return model.apply(variables, x, method=model.sample,
                           rngs={"diffusion": jax.random.PRNGKey(0)})

    exported = jexport.export(jax.jit(fwd))(
        jax.ShapeDtypeStruct(img.shape, img.dtype))
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {args.out} ({len(blob) / 1e6:.1f} MB), "
          f"in {exported.in_avals} -> out {exported.out_avals}")


if __name__ == "__main__":
    main()
