"""VAE-capacity probe for the ControlNet convergence run (VERDICT r3 item 3).

The r3 ControlNet generations were VAE-bound: after an 800-iter pretrain the
first stage reconstructed fill50k frames at MSE ~0.10 (washed-out pastels),
capping any UNet on top. Before burning a multi-hour retrain, this probe
trains candidate VAE capacities for a fixed budget and reports the recon MSE
trajectory — the generation ceiling of each choice.

Usage: python tools/probe_vae.py [--iters 800]
Writes work_dirs/vae_probe.json.
"""
import argparse
import dataclasses as dc
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def eval_recon(vae, params, ds, n=16, seed=0):
    """Deterministic recon MSE (mean latent, no sampling) on held-out."""
    imgs = np.stack([ds.load(100_000 + i)["image"] for i in range(n)])

    @jax.jit
    def recon(params, img):
        mean, _ = vae.apply({"params": params}, img, method=vae.encode)
        return vae.apply({"params": params}, mean, method=vae.decode)

    rec = np.asarray(recon(params, jnp.asarray(imgs)))
    return float(np.mean((rec - imgs) ** 2))


def run_variant(tag, ch, nrb, iters, lr=2e-3):
    from run_convergence import pretrain_vae

    from ddp_tpu.config import apply_overrides, get_config
    from ddp_tpu.config import build_model
    from ddp_tpu.data.controlnet_data import SyntheticFill50k
    from ddp_tpu.nn.autoencoder import AutoencoderKL

    cfg = get_config("converge_controlnet")
    cfg = apply_overrides(cfg, {"model.cn_vae_ch": ch,
                                "model.cn_vae_nrb": nrb})
    params, _scale = pretrain_vae(cfg.model, iters=iters, lr=lr)
    trainer = build_model(cfg.model)
    vae = AutoencoderKL(embed_dim=trainer.unet.in_channels,
                        ch=trainer.vae_ch, ch_mult=trainer.vae_ch_mult,
                        num_res_blocks=trainer.vae_nrb)
    ds = SyntheticFill50k(size=cfg.model.cn_image_size)
    mse = eval_recon(vae, params, ds)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"{tag}: heldout recon MSE {mse:.5f} ({n_params/1e3:.0f}k params)",
          flush=True)
    return {"ch": ch, "nrb": nrb, "iters": iters,
            "heldout_recon_mse": round(mse, 5),
            "params_k": round(n_params / 1e3)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=800)
    p.add_argument("--variants", nargs="*",
                   default=["ch16_nrb1", "ch32_nrb1", "ch32_nrb2"])
    args = p.parse_args()
    out = {}
    for tag in args.variants:
        ch = int(tag.split("_")[0][2:])
        nrb = int(tag.split("_")[1][3:])
        out[tag] = run_variant(tag, ch, nrb, args.iters)
    os.makedirs("work_dirs", exist_ok=True)
    path = os.path.join("work_dirs", "vae_probe.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
