"""Convert a released torch DDP checkpoint (.pth) into this framework's
orbax format — reference tools/model_converters/ equivalent.

Usage:
  python tools/import_checkpoint.py ckpt.pth --preset ade20k_swin_t \
      --out work_dirs/imported_swin_t
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--preset", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--set", nargs="*", default=[], metavar="K=V")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np
    import torch

    from ddp_tpu.config import get_config
    from ddp_tpu.train.torch_import import import_ddp_seg

    cfg = get_config(args.preset, dict(kv.split("=", 1) for kv in args.set))
    if cfg.model.decoder_attn != "msda":
        # torch checkpoints are MSDA-shaped; the window decoder is the
        # from-scratch TPU flagship only (decoder decision, r3)
        from ddp_tpu.config import apply_overrides

        cfg = apply_overrides(cfg, {"model.decoder_attn": "msda"})
        print("note: forcing model.decoder_attn=msda for torch import")
    raw = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    state = raw.get("state_dict", raw)
    state = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
             for k, v in state.items()}

    variables, report = import_ddp_seg(
        state, cfg.model.backbone_type, cfg.model.backbone_variant,
        decoder_layers=cfg.model.decoder_layers)
    print(f"missing ({len(report['missing'])}):", report["missing"][:20])
    print(f"unused  ({len(report['unused'])}):", report["unused"][:20])

    import orbax.checkpoint as ocp

    path = os.path.abspath(args.out)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "imported"), variables, force=True)
    ckptr.wait_until_finished()
    ckptr.close()
    print(f"saved to {path}/imported")
    if report["missing"] or report["unused"]:
        print("WARNING: import incomplete — inspect the lists above")
        sys.exit(1)


if __name__ == "__main__":
    main()
