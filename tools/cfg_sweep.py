"""CFG-scale / DDIM-steps sweep on a trained ControlNet checkpoint.

The fill50k target is DETERMINISTIC given hint+prompt, so generation PSNR
is an honest proxy for sampler fidelity. With the r5 shallow-VAE ceiling
measured at ~27 dB and eps-loss at 1.5e-3, the remaining gap between the
published PSNR and the ceiling belongs to the sampling configuration —
guidance scale pushes samples off-manifold on a task with no ambiguity
(the reference demos default scale 9 for *creative* generation; a
deterministic fill task wants little or no CFG). This sweep measures it
instead of guessing. Writes work_dirs/converge_controlnet/cfg_sweep.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ddp_tpu.config import build_model, get_config
    from ddp_tpu.data.controlnet_data import SyntheticFill50k, tokenize
    from run_convergence import HELDOUT_BASE, _restore_variables

    cfg = get_config("converge_controlnet")
    sj = os.path.join(cfg.runtime.workdir, "scale.json")
    if os.path.exists(sj):
        import dataclasses

        sf = json.load(open(sj))["cn_scale_factor"]
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, cn_scale_factor=sf))
    variables, step = _restore_variables(cfg)
    model = build_model(cfg.model)
    ds = SyntheticFill50k(size=cfg.model.cn_image_size)
    n = 8
    samples = [ds.load(HELDOUT_BASE + i) for i in range(n)]
    hint = jnp.asarray(np.stack([s["hint"] for s in samples]))
    ids = jnp.asarray(np.stack([s["ids"] for s in samples]))
    uncond = jnp.asarray(np.stack([tokenize("")] * n))
    target = np.stack([s["image"] for s in samples])

    out = {"ckpt_step": int(step), "rows": {}}
    for steps in (20, 50):
        # guidance traced => one compile per step count, not per scale
        @jax.jit
        def gen(variables, hint, ids, uncond, rng, guidance):
            return model.apply(variables, hint, ids, uncond, steps, guidance,
                               method=model.sample, rngs={"diffusion": rng})

        for g in (1.0, 1.5, 2.0, 3.0, 5.0):
            img = np.clip(np.asarray(
                gen(variables, hint, ids, uncond, jax.random.PRNGKey(0),
                    jnp.float32(g))), -1, 1)
            mse = float(np.mean((img - target) ** 2))
            row = {"psnr_db": round(10 * np.log10(4.0 / max(mse, 1e-12)), 2),
                   "mae": round(float(np.mean(np.abs(img - target))), 4)}
            out["rows"][f"s{steps}_g{g}"] = row
            print(f"steps={steps} guidance={g}: {row}", flush=True)
    path = os.path.join(cfg.runtime.workdir, "cfg_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
