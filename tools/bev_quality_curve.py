"""Quality side of the BEV sensor-rate trade-off (VERDICT r3 item 6).

BENCH_EXTRA's bev_sensor_rate row measures frames/s of the nuScenes-shaped
camera model at randsteps {5,3,1} × depth-topk {off,16}; this script
measures the QUALITY impact of the same levers on the converged synthetic
rig (work_dirs/converge_bev checkpoint): held-out map mIoU at 3-step DDIM
for randsteps 1/3/5 and depth_topk off/4 (the tiny rig has 8 depth bins).

Writes work_dirs/converge_bev/quality_curve.json.
"""
import dataclasses as dc
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from run_convergence import _restore_variables, eval_bev

from ddp_tpu.config import get_config


def main():
    fusion = "--fusion" in sys.argv
    cfg = get_config("converge_bev_fusion" if fusion else "converge_bev")
    variables, step = _restore_variables(cfg)
    print(f"restored step {step}", flush=True)
    out = {"ckpt_step": step}
    if fusion:
        # fusion path (VERDICT r4 item 10): randsteps is the serving dial —
        # pair these rows with BENCH_EXTRA's bev_fusion_rate frames/s
        from run_convergence import eval_bev_fusion

        for r in (1, 3, 5):
            mc = dc.replace(
                cfg.model,
                diffusion=dc.replace(cfg.model.diffusion, randsteps=r))
            res = eval_bev_fusion(variables, mc, timesteps_list=(3,))
            out[f"r{r}"] = {"map_mIoU@3step": res["map_mIoU@3step"],
                            "std": res["map_mIoU@3step_std"]}
            print(f"r{r}: {res['map_mIoU@3step']}", flush=True)
    else:
        for topk in (0, 4):
            for r in (1, 3, 5):
                mc = dc.replace(
                    cfg.model, bev_depth_topk=topk,
                    diffusion=dc.replace(cfg.model.diffusion, randsteps=r))
                res = eval_bev(variables, mc, timesteps_list=(3,))
                key = f"topk{topk}_r{r}"
                out[key] = {"map_mIoU@3step": res["map_mIoU@3step"],
                            "std": res["map_mIoU@3step_std"]}
                print(f"{key}: {res['map_mIoU@3step']}", flush=True)
    path = os.path.join(cfg.runtime.workdir, "quality_curve.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
