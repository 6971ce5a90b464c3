"""Window-decoder 10-step plateau investigation (VERDICT r2 weak #7).

Round-2 observation: seg_window mIoU@10 (0.9254) < mIoU@3 (0.9257) while
msda improves monotonically. This evaluates BOTH converged checkpoints over
a denser horizon grid (1/3/5/10/20 steps) with more seeds, plus a
no-accumulation ablation at T=10 to separate the two candidate mechanisms:

  (a) rollout drift — the dense decoder's spatial smoothing feeds back
      over more steps (would show accumulation-independent decay), vs
  (b) ensemble dilution — with accumulation=True early low-quality steps
      are averaged in, and more steps average in more early noise (would
      vanish without accumulation / with later-step-only averaging).

Writes work_dirs/plateau_window.json.
"""
import dataclasses
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

spec = importlib.util.spec_from_file_location(
    "rc", os.path.join(os.path.dirname(__file__), "run_convergence.py"))
rc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rc)


def main():
    import argparse

    import jax

    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--seeds", type=int, default=5)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ddp_tpu.config import get_config

    seeds = tuple(range(args.seeds))
    out = {}
    for name, preset in (("window", "converge_seg_window"),
                         ("msda", "converge_seg")):
        cfg = get_config(preset)
        variables, step = rc._restore_variables(cfg)
        print(f"=== {name} (step {step}) ===", flush=True)
        out[name] = rc.eval_seg(variables, cfg.model,
                                timesteps_list=(1, 3, 5, 10, 20),
                                seeds=seeds)
        # ablation: accumulation off at T=10 (pure final-step prediction)
        mc = dataclasses.replace(
            cfg.model, diffusion=dataclasses.replace(
                cfg.model.diffusion, accumulation=False))
        abl = rc.eval_seg(variables, mc, timesteps_list=(3, 10), seeds=seeds)
        out[name]["noaccum_mIoU@3step"] = abl["mIoU@3step"]
        out[name]["noaccum_mIoU@10step"] = abl["mIoU@10step"]

    path = "work_dirs/plateau_window.json"
    os.makedirs("work_dirs", exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
