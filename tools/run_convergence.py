"""Convergence-proof harness (VERDICT r1 item 1).

Trains the flagship-shaped-but-tiny presets on the synthetic datasets through
the REAL train() loop, then evaluates with the real multi-step rollout:

  seg          — mIoU at 1/3/10-step DDIM, seed-averaged (the reference's
                 headline behavior: 3-step >= 1-step, segmentation/README.md:52)
  seg_aligned  — SelfAlignedDDP fine-tune from the seg checkpoint; the steps
                 curve should flatten (82.3/82.6/82.6-style)
  depth        — 9 depth metrics at 1/3-step
  bev          — BEV map IoU@thresholds with randsteps ensembling

Each experiment writes work_dirs/<name>/result.json; `--publish` merges the
summary into BASELINE.json's "published" block.

Usage: python tools/run_convergence.py [seg seg_aligned depth bev | all]
                                       [--publish] [--eval-only]
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _setup_cache():
    """Persistent compile cache — opt-IN via DDP_TPU_CACHE, mirroring
    bench.py: serializing executables through the sandboxed TPU relay backend has been
    observed to wedge the process right after writing the cache entry
    (seen again 2026-08-21 on the converge_seg train step)."""
    if not os.environ.get("DDP_TPU_CACHE"):
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_EVAL = 32
EVAL_BATCH = 8
SEEDS = (0, 1, 2)
HELDOUT_BASE = 100_000  # synthetic datasets are seeded by index; train uses [0, length)


def _variables_from_state(state):
    v = {"params": state.params}
    if state.batch_stats:
        v["batch_stats"] = state.batch_stats
    return v


def _restore_variables(cfg, workdir=None):
    """Load the latest checkpoint of a preset into a variables dict."""
    import jax

    from ddp_tpu.config import build_model
    from ddp_tpu.train.checkpoint import CheckpointManager
    from ddp_tpu.train.optim import make_optimizer
    from ddp_tpu.train.state import TrainState

    model = build_model(cfg.model)
    if cfg.model.task in ("bev", "bev_fusion", "controlnet"):
        from ddp_tpu.data import make_train_iter

        if cfg.model.task == "bev":
            keys = ("image", "cam2lidar_rots", "cam2lidar_trans", "intrins",
                    "post_rots", "post_trans", "label")
        elif cfg.model.task == "bev_fusion":
            from ddp_tpu.data.bev_datasets import FUSION_BATCH_KEYS as keys
        else:
            keys = ("image", "hint", "ids")
        b = next(make_train_iter(cfg))
        import jax.numpy as jnp

        def first(a):
            return jax.tree_util.tree_map(lambda x: jnp.asarray(x[:1]), a)

        args = [first(b[k]) for k in keys]
    else:
        import jax.numpy as jnp

        h, w = cfg.data.crop_size
        args = [jnp.zeros((1, h, w, 3)), jnp.zeros(
            (1, h, w), jnp.int32 if cfg.model.task == "seg" else jnp.float32)]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, *args, train=False)
    ckpt = CheckpointManager(workdir or cfg.runtime.workdir)
    if ckpt.latest_step() is None:
        raise FileNotFoundError(f"no checkpoint in {workdir or cfg.runtime.workdir}")
    tx = make_optimizer(cfg.optim, variables["params"])
    tmpl = TrainState.create(variables["params"], tx,
                             variables.get("batch_stats", {}))
    state = ckpt.restore(jax.device_get(tmpl))
    return _variables_from_state(state), int(state.step)


def eval_seg(variables, mc, timesteps_list=(1, 3, 10), seeds=SEEDS):
    """Seed-averaged mIoU of the T-step DDIM rollout on held-out synthetic."""
    import jax
    import jax.numpy as jnp

    from ddp_tpu.config import build_model
    from ddp_tpu.data.pipelines import normalize
    from ddp_tpu.data.seg_datasets import SyntheticSegDataset
    from ddp_tpu.evaluation.metrics import SegMetricAccumulator

    ds = SyntheticSegDataset(mc.num_classes, (64, 64))
    out = {}
    for T in timesteps_list:
        mT = build_model(dataclasses.replace(
            mc, diffusion=dataclasses.replace(mc.diffusion, timesteps=T)))

        @jax.jit
        def predict(variables, img, rng):
            return mT.apply(variables, img, method=mT.sample,
                            rngs={"diffusion": rng})

        mious = []
        for seed in seeds:
            acc = SegMetricAccumulator(mc.num_classes)
            rng = jax.random.PRNGKey(seed)
            for s0 in range(0, N_EVAL, EVAL_BATCH):
                imgs, labels = [], []
                for i in range(s0, s0 + EVAL_BATCH):
                    s = normalize(ds.load(HELDOUT_BASE + i),
                                  (123.675, 116.28, 103.53),
                                  (58.395, 57.12, 57.375))
                    imgs.append(s["image"])
                    labels.append(s["label"])
                probs = predict(variables, jnp.asarray(np.stack(imgs)),
                                jax.random.fold_in(rng, s0))
                pred = np.asarray(jnp.argmax(probs, axis=-1))
                for p, l in zip(pred, labels):
                    acc.update(p, l)
            mious.append(acc.compute()["mIoU"])
        out[f"mIoU@{T}step"] = round(float(np.mean(mious)), 4)
        out[f"mIoU@{T}step_std"] = round(float(np.std(mious)), 4)
        print(f"  seg {T}-step: mIoU {out[f'mIoU@{T}step']:.4f} "
              f"± {out[f'mIoU@{T}step_std']:.4f}", flush=True)
    return out


def eval_depth(variables, mc, timesteps_list=(1, 3, 10), seeds=SEEDS):
    import jax
    import jax.numpy as jnp

    from ddp_tpu.config import build_model
    from ddp_tpu.data.depth_datasets import SyntheticDepthDataset
    from ddp_tpu.data.pipelines import normalize
    from ddp_tpu.evaluation.metrics import depth_metrics

    ds = SyntheticDepthDataset((64, 64), max_depth=mc.max_depth)
    out = {}
    for T in timesteps_list:
        mT = build_model(dataclasses.replace(
            mc, diffusion=dataclasses.replace(mc.diffusion, timesteps=T)))

        @jax.jit
        def predict(variables, img, rng):
            return mT.apply(variables, img, method=mT.sample,
                            rngs={"diffusion": rng})

        rels, rmses, a1s = [], [], []
        for seed in seeds:
            rng = jax.random.PRNGKey(seed)
            preds, gts = [], []
            for s0 in range(0, N_EVAL, EVAL_BATCH):
                imgs, labels = [], []
                for i in range(s0, s0 + EVAL_BATCH):
                    s = normalize(ds.load(HELDOUT_BASE + i),
                                  (123.675, 116.28, 103.53),
                                  (58.395, 57.12, 57.375))
                    imgs.append(s["image"])
                    labels.append(s["label"])
                d = predict(variables, jnp.asarray(np.stack(imgs)),
                            jax.random.fold_in(rng, s0))
                preds.append(np.asarray(d))
                gts.append(np.stack(labels))
            m = depth_metrics(np.concatenate(preds), np.concatenate(gts))
            rels.append(m["abs_rel"]); rmses.append(m["rmse"]); a1s.append(m["a1"])
        out[f"abs_rel@{T}step"] = round(float(np.mean(rels)), 4)
        out[f"abs_rel@{T}step_std"] = round(float(np.std(rels)), 4)
        out[f"rmse@{T}step"] = round(float(np.mean(rmses)), 4)
        out[f"rmse@{T}step_std"] = round(float(np.std(rmses)), 4)
        out[f"a1@{T}step"] = round(float(np.mean(a1s)), 4)
        print(f"  depth {T}-step: abs_rel {out[f'abs_rel@{T}step']:.4f} "
              f"± {out[f'abs_rel@{T}step_std']:.4f} "
              f"rmse {out[f'rmse@{T}step']:.4f} a1 {out[f'a1@{T}step']:.4f}",
              flush=True)
    return out


def eval_bev(variables, mc, timesteps_list=(1, 3), seeds=SEEDS):
    """Seed-averaged BEV map IoU at each DDIM horizon (reference headline
    behavior: 3-step >= 1-step, with randsteps ensembling)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from ddp_tpu.config import build_model
    from ddp_tpu.data.bev_datasets import SyntheticBEVDataset

    from ddp_tpu.evaluation.metrics import bev_map_iou

    ds = SyntheticBEVDataset(num_cams=mc.bev_num_cams,
                             image_size=mc.bev_image_size,
                             out_grid=mc.bev_out_grid,
                             num_classes=mc.num_classes,
                             scope=mc.bev_xbound[1])
    mean = np.asarray((123.675, 116.28, 103.53), np.float32)
    std = np.asarray((58.395, 57.12, 57.375), np.float32)

    out = {}
    for T in timesteps_list:
        model = build_model(dc.replace(
            mc, diffusion=dc.replace(mc.diffusion, timesteps=T)))

        @jax.jit
        def predict(variables, img, rots, trans, intr, prots, ptrans, rng,
                    model=model):
            return model.apply(variables, img, rots, trans, intr, prots,
                               ptrans, method=model.sample,
                               rngs={"diffusion": rng})

        mious = []
        for seed in seeds:
            rng = jax.random.PRNGKey(seed)
            scores, gts = [], []
            for s0 in range(0, N_EVAL, EVAL_BATCH):
                batch = {k: [] for k in ("image", "cam2lidar_rots",
                                         "cam2lidar_trans", "intrins",
                                         "post_rots", "post_trans", "label")}
                for i in range(s0, s0 + EVAL_BATCH):
                    s = ds.load(HELDOUT_BASE + i)
                    s["image"] = (s["image"] - mean) / std
                    for k in batch:
                        batch[k].append(s[k])
                arrs = {k: jnp.asarray(np.stack(v)) for k, v in batch.items()}
                sc = predict(variables, arrs["image"], arrs["cam2lidar_rots"],
                             arrs["cam2lidar_trans"], arrs["intrins"],
                             arrs["post_rots"], arrs["post_trans"],
                             jax.random.fold_in(rng, s0))
                scores.append(np.asarray(sc))
                gts.append(np.stack(batch["label"]))
            sc = np.concatenate(scores).transpose(0, 3, 1, 2)  # [N,K,G,G]
            gt = np.concatenate(gts).transpose(0, 3, 1, 2)
            m = bev_map_iou(sc, gt)
            mious.append(m["mIoU"])
        out[f"map_mIoU@{T}step"] = round(float(np.mean(mious)), 4)
        out[f"map_mIoU@{T}step_std"] = round(float(np.std(mious)), 4)
        if T == timesteps_list[-1]:
            out.update({k: v for k, v in m.items() if k.startswith("iou_")})
        print(f"  bev {T}-step: map mIoU {out[f'map_mIoU@{T}step']:.4f} "
              f"± {out[f'map_mIoU@{T}step_std']:.4f}", flush=True)
    return out


def eval_bev_fusion(variables, mc, timesteps_list=(1, 3), seeds=SEEDS):
    """Fusion-path BEV map IoU on held-out synthetic scenes (camera rig +
    voxelized lidar through the rulebook spconv encoder), per DDIM horizon."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from ddp_tpu.config import build_model
    from ddp_tpu.data.bev_datasets import (FUSION_BATCH_KEYS,
                                           SyntheticFusionDataset)
    from ddp_tpu.evaluation.metrics import bev_map_iou

    ds = SyntheticFusionDataset(
        sparse_shape=mc.bev_sparse_shape, caps=mc.bev_voxel_caps,
        voxel_size=mc.bev_voxel_size, num_cams=mc.bev_num_cams,
        image_size=mc.bev_image_size,
        out_grid=mc.bev_out_grid, num_classes=mc.num_classes,
        scope=mc.bev_xbound[1])
    mean = np.asarray((123.675, 116.28, 103.53), np.float32)
    std = np.asarray((58.395, 57.12, 57.375), np.float32)
    arg_keys = FUSION_BATCH_KEYS[:-1]  # all but label

    # cache loaded+normalized eval samples across horizons (voxelization +
    # rulebook build dominate load time for fusion)
    cache = {}

    def sample_at(i):
        if i not in cache:
            s = ds.load(i)
            s["image"] = (s["image"] - mean) / std
            cache[i] = s
        return cache[i]

    out = {}
    for T in timesteps_list:
        model = build_model(dc.replace(
            mc, diffusion=dc.replace(mc.diffusion, timesteps=T)))

        @jax.jit
        def predict(variables, args, rng, model=model):
            return model.apply(variables, *args, method=model.sample,
                               rngs={"diffusion": rng})

        mious = []
        for seed in seeds:
            rng = jax.random.PRNGKey(seed)
            scores, gts = [], []
            for s0 in range(0, N_EVAL, EVAL_BATCH):
                samples = [sample_at(HELDOUT_BASE + i)
                           for i in range(s0, s0 + EVAL_BATCH)]
                batch = {}
                for k in arg_keys:
                    if k == "rulebooks":
                        batch[k] = {kk: jnp.asarray(np.stack(
                            [s[k][kk] for s in samples]))
                            for kk in samples[0][k]}
                    else:
                        batch[k] = jnp.asarray(
                            np.stack([s[k] for s in samples]))
                sc = predict(variables, [batch[k] for k in arg_keys],
                             jax.random.fold_in(rng, s0))
                scores.append(np.asarray(sc))
                gts.append(np.stack([s["label"] for s in samples]))
            sc = np.concatenate(scores).transpose(0, 3, 1, 2)
            gt = np.concatenate(gts).transpose(0, 3, 1, 2)
            m = bev_map_iou(sc, gt)
            mious.append(m["mIoU"])
        out[f"map_mIoU@{T}step"] = round(float(np.mean(mious)), 4)
        out[f"map_mIoU@{T}step_std"] = round(float(np.std(mious)), 4)
        if T == timesteps_list[-1]:
            out.update({k: v for k, v in m.items() if k.startswith("iou_")})
        print(f"  bev_fusion {T}-step: map mIoU "
              f"{out[f'map_mIoU@{T}step']:.4f} "
              f"± {out[f'map_mIoU@{T}step_std']:.4f}", flush=True)
    return out


def eval_controlnet(variables, mc, workdir, steps=20, guidance=1.0,
                    n_grid=8, seed=0):
    """Conditional-generation evidence (VERDICT r2 missing #3): sample a grid
    of held-out fill50k hints with CFG DDIM, save hint|generated|target PNG,
    and report PSNR/MAE vs the procedural ground truth (hint position +
    prompt colors fully determine the target image).

    guidance defaults to 1.0 (no CFG): the fill50k target is deterministic
    given hint+prompt, and the r5 sweep (tools/cfg_sweep.py,
    work_dirs/converge_controlnet/cfg_sweep.json) measured CFG as pure
    off-manifold distortion here — 27.3 dB at g=1.0 vs 21.3 at the old
    g=3.0, monotone in between, at both 20 and 50 DDIM steps. The
    reference demos default scale 9 for *creative* generation, a
    different regime (gradio_seg2image_ddp.py)."""
    import jax
    import jax.numpy as jnp

    from ddp_tpu.config import build_model
    from ddp_tpu.data.controlnet_data import SyntheticFill50k, tokenize

    model = build_model(mc)
    ds = SyntheticFill50k(size=mc.cn_image_size)
    samples = [ds.load(HELDOUT_BASE + i) for i in range(n_grid)]
    hint = jnp.asarray(np.stack([s["hint"] for s in samples]))
    ids = jnp.asarray(np.stack([s["ids"] for s in samples]))
    uncond = jnp.asarray(np.stack([tokenize("")] * n_grid))
    target = np.stack([s["image"] for s in samples])  # [-1, 1]

    @jax.jit
    def gen(variables, hint, ids, uncond, rng):
        return model.apply(variables, hint, ids, uncond, steps, guidance,
                           method=model.sample, rngs={"diffusion": rng})

    img = np.asarray(gen(variables, hint, ids, uncond,
                         jax.random.PRNGKey(seed)))
    img = np.clip(img, -1.0, 1.0)
    mse = float(np.mean((img - target) ** 2))  # over [-1,1] range
    mae = float(np.mean(np.abs(img - target)))
    psnr = float(10.0 * np.log10(4.0 / max(mse, 1e-12)))

    # PNG grid: rows = hint / generated / target
    from PIL import Image

    def to_u8(a, lo, hi):
        return np.clip((a - lo) / (hi - lo) * 255.0, 0, 255).astype(np.uint8)

    rows = [np.concatenate(list(to_u8(np.asarray(hint), 0, 1)), axis=1),
            np.concatenate(list(to_u8(img, -1, 1)), axis=1),
            np.concatenate(list(to_u8(target, -1, 1)), axis=1)]
    grid = np.concatenate(rows, axis=0)
    png = os.path.join(workdir, "samples.png")
    Image.fromarray(grid).save(png)
    print(f"  controlnet: psnr {psnr:.2f} dB mae {mae:.4f} → {png}",
          flush=True)
    return {"psnr_db": round(psnr, 2), "mae": round(mae, 4),
            "cfg_scale": guidance, "ddim_steps": steps,
            "samples_png": png}


def pretrain_vae(mc, iters=2500, batch=8, lr=2e-3, seed=0):
    """Stage-1 VAE pretraining for the from-scratch ControlNet demo.

    The reference's first stage is a PRETRAINED, frozen AutoencoderKL (SD
    weights; ldm trains it separately with a recon+KL objective). Our
    p_losses only optimizes eps-MSE, so without this stage the latent space
    and decoder stay random and every generation decodes to noise (r3
    finding: 600-iter run reached eps-loss 0.069 yet MAE 0.68 vs target).
    Trains recon+KL on fill50k images; the params are injected under
    ldm/first_stage_model and frozen via the preset's lr_mult-0 rule.

    r3 ceiling analysis: at 800 pretrain iters the VAE recon (MSE ~0.10)
    is itself washed-out — even a perfect UNet would generate those
    pastels. The default budget is now 2500; the next quality lever after
    that is a shallower VAE (4x downsample -> 16x16 latent at 64px).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ddp_tpu.config import build_model
    from ddp_tpu.data.controlnet_data import SyntheticFill50k
    from ddp_tpu.nn.autoencoder import AutoencoderKL

    trainer = build_model(mc)
    vae = AutoencoderKL(embed_dim=trainer.unet.in_channels, ch=trainer.vae_ch,
                        ch_mult=trainer.vae_ch_mult,
                        num_res_blocks=trainer.vae_nrb)
    ds = SyntheticFill50k(size=mc.cn_image_size)
    img0 = jnp.zeros((1, mc.cn_image_size, mc.cn_image_size, 3))
    variables = vae.init(jax.random.PRNGKey(seed), img0,
                         method=lambda m, x: m.decode(m.encode(x)[0]))
    # r4: cosine-decayed lr — the r3 constant-lr run plateaued around MSE
    # 0.10 (tools/probe_vae.py: the loss is still falling fast at iter 800;
    # annealing, not capacity, is the binding lever at this budget)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=50, decay_steps=iters, end_value=lr * 1e-3)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, img, rng):
        def loss_fn(p):
            mean, logvar = vae.apply({"params": p}, img, method=vae.encode)
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape)
            rec = vae.apply({"params": p}, z, method=vae.decode)
            kl = 0.5 * jnp.mean(mean ** 2 + jnp.exp(logvar) - 1.0 - logvar)
            return jnp.mean((rec - img) ** 2) + 1e-6 * kl

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    rng = jax.random.PRNGKey(seed + 1)
    for i in range(iters):
        idxs = np.random.default_rng((seed, i)).integers(0, len(ds), batch)
        img = jnp.asarray(np.stack([ds.load(int(j))["image"] for j in idxs]))
        rng, r = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, img, r)
        if i % 100 == 0 or i == iters - 1:
            print(f"  vae pretrain {i}: recon+kl {float(loss):.5f}",
                  flush=True)

    # data-derived latent scale (r4 lever, executed): ldm picks scale_factor
    # so scaled latents are unit-std (ddpm.py on_train_batch_start's
    # 1/z.flatten().std() rescale); with SD's 0.18215 our from-scratch VAE's
    # scaled latents had std 0.64, a train/sample prior mismatch.
    probe = jnp.asarray(np.stack(
        [ds.load(HELDOUT_BASE + 64 + j)["image"] for j in range(64)]))
    mean, logvar = vae.apply({"params": params}, probe, method=vae.encode)
    # std of the SAMPLED z (same reparameterization training uses), not of
    # the posterior mean: with non-negligible logvar the mean-only std
    # understates the latent std and reintroduces the prior mismatch
    # (advisor r4)
    z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
        jax.random.PRNGKey(seed + 2), mean.shape)
    scale = float(1.0 / (np.asarray(z).std() + 1e-8))
    print(f"  vae latent std {1.0 / scale:.4f} -> scale_factor {scale:.5f}",
          flush=True)
    return params, scale


def train_controlnet_ondevice(cfg, init_variables, chunk=500, seed=0):
    """ControlNet training with ON-DEVICE data generation (r4).

    The generic train() loop feeds host batches; through the sandboxed TPU relay every
    dispatch re-ships the full params+opt state (~0.5 steps/s for the 27M
    'small' stack regardless of compute). fill50k is procedural, so the
    batch is generated on chip (device_fill50k_batch) and the whole run is
    chunked ``lax.scan`` dispatches — host traffic is one scalar loss
    vector per chunk. Same model.apply / optimizer chain as train();
    writes the same train_log.jsonl schema and a loop-compatible orbax
    checkpoint (restorable by _restore_variables).
    """
    import time

    import jax
    import jax.numpy as jnp
    import optax

    from ddp_tpu.config import build_model
    from ddp_tpu.data.controlnet_data import device_fill50k_batch
    from ddp_tpu.train.checkpoint import CheckpointManager
    from ddp_tpu.train.optim import make_lr_schedule, make_optimizer
    from ddp_tpu.train.state import TrainState

    model = build_model(cfg.model)
    b = cfg.data.batch_size
    s = cfg.model.cn_image_size
    total = cfg.runtime.total_iters
    tx = make_optimizer(cfg.optim, init_variables["params"])
    sched = make_lr_schedule(cfg.optim)
    base_key = jax.random.PRNGKey(seed)

    def one_step(carry, step_idx):
        params, opt_state = carry
        k = jax.random.fold_in(base_key, step_idx)
        # independent streams: correlated diffusion/dropout keys are a
        # latent hazard once dropout is enabled (advisor r4)
        kd, kr, kdrop = jax.random.split(k, 3)
        img, hint, ids = device_fill50k_batch(kd, b, s)

        def loss_fn(p):
            loss, _ = model.apply({"params": p}, img, hint, ids,
                                  rngs={"diffusion": kr, "dropout": kdrop})
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), (loss, gnorm)

    @jax.jit
    def run_chunk(params, opt_state, steps):
        (params, opt_state), (losses, gnorms) = jax.lax.scan(
            one_step, (params, opt_state), steps)
        return params, opt_state, losses, gnorms

    params = init_variables["params"]
    opt_state = tx.init(params)
    log_path = os.path.join(cfg.runtime.workdir, "train_log.jsonl")
    ckpt = CheckpointManager(cfg.runtime.workdir,
                             max_keep=cfg.runtime.max_keep_ckpts)

    def save_ckpt(step_done):
        st = TrainState.create(init_variables["params"], tx, {})
        st = st.replace(step=jnp.asarray(step_done, jnp.int32),
                        params=params, opt_state=opt_state)
        ckpt.save(step_done, jax.device_get(st),
                  meta={"preset": cfg.name, "ondevice_data": True})
        # re-stamp scale.json with the step it matches, so a consumer can
        # tell a scale that belongs to a real checkpoint from one left by
        # an aborted pre-training run (advisor r4)
        with open(os.path.join(cfg.runtime.workdir, "scale.json"), "w") as f:
            json.dump({"cn_scale_factor": cfg.model.cn_scale_factor,
                       "step": int(step_done)}, f)

    # save at ckpt_interval boundaries (rounded up to chunk), not only at
    # the end: a crash mid-run must not lose the whole run (advisor r4)
    save_every = max(int(cfg.runtime.ckpt_interval), chunk)
    done = 0
    while done < total:
        n = min(chunk, total - done)
        t0 = time.time()
        params, opt_state, losses, gnorms = run_chunk(
            params, opt_state, jnp.arange(done, done + n))
        losses = np.asarray(losses)  # forces completion of the chunk
        dt = time.time() - t0
        prev = done
        done += n
        rec = {"step": done, "lr": float(sched(done - 1)),
               "steps_per_s": round(n / dt, 3),
               "grad_norm": float(np.asarray(gnorms)[-1]),
               "loss": float(losses[-1]),
               "loss_chunk_mean": round(float(losses.mean()), 5)}
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"  [{done}/{total}] loss {rec['loss_chunk_mean']:.4f} "
              f"({rec['steps_per_s']:.1f} steps/s)", flush=True)
        if done < total and prev // save_every != done // save_every:
            save_ckpt(done)

    save_ckpt(done)
    return {"params": params}


def run_experiment(name, eval_only=False, iters=None, train_only=False,
                   resume=False):
    import jax

    from ddp_tpu.config import apply_overrides, get_config
    from ddp_tpu.data import make_train_iter
    from ddp_tpu.train.loop import train

    preset = {"seg": "converge_seg", "seg_aligned": "converge_seg_aligned",
              "seg_window": "converge_seg_window",
              "seg_quarter": "converge_seg_quarter",
              "seg_msda": "converge_seg_msda",
              "seg_w16h4": "converge_seg_w16h4",
              "seg_aligned_msda": "converge_seg_aligned_msda",
              "depth": "converge_depth", "bev": "converge_bev",
              "bev_fusion": "converge_bev_fusion",
              "controlnet": "converge_controlnet"}[name]
    cfg = get_config(preset)
    if iters:
        cfg = apply_overrides(cfg, {"runtime.total_iters": iters,
                                    "optim.total_steps": iters})
    if not eval_only and not resume:
        # clear stale checkpoints from earlier runs: a fresh run re-saving
        # the same step number would silently keep the OLD weights
        import shutil

        ck = os.path.join(cfg.runtime.workdir, "ckpts")
        if os.path.isdir(ck):
            shutil.rmtree(ck)
        # rotate the train log too: appending a fresh run to the old log
        # interleaves abandoned trajectories with the published one
        # (advisor r3); keep one .prev for forensics
        tl = os.path.join(cfg.runtime.workdir, "train_log.jsonl")
        if os.path.exists(tl):
            os.replace(tl, tl + ".prev")
    os.makedirs(cfg.runtime.workdir, exist_ok=True)
    # restore the measured latent scale (written by a fresh controlnet run's
    # VAE pretrain) so resume/eval-only rebuilds match the trained scaling
    if resume:
        # refuse a resume with nothing to resume from: the generic train()
        # path would otherwise silently start from random init (and for
        # controlnet, without the stage-1 VAE pretrain) — advisor r4
        from ddp_tpu.train.checkpoint import CheckpointManager

        if CheckpointManager(cfg.runtime.workdir).latest_step() is None:
            raise FileNotFoundError(
                f"--resume requested but no checkpoint exists in "
                f"{cfg.runtime.workdir}; run without --resume first")
    sj = os.path.join(cfg.runtime.workdir, "scale.json")
    if name == "controlnet" and (eval_only or resume) and os.path.exists(sj):
        with open(sj) as f:
            sf = json.load(f)["cn_scale_factor"]
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, cn_scale_factor=sf))
        print(f"restored cn_scale_factor {sf:.5f}", flush=True)
    print(f"=== {name} ({preset}) ===", flush=True)

    if eval_only:
        variables, step = _restore_variables(cfg)
        print(f"restored step {step}", flush=True)
    else:
        init_params = None
        if name in ("seg_aligned", "seg_aligned_msda"):
            # fine-tune from the converged standard-DDP checkpoint of the
            # SAME decoder type (reference recipe: load_from the 160k ckpt)
            from ddp_tpu.config import get_config as gc

            base = "converge_seg_msda" if name.endswith("_msda") else "converge_seg"
            init_params, step = _restore_variables(gc(base))
            print(f"fine-tuning from {base} step {step}", flush=True)
        elif name == "controlnet" and not resume:
            # stage 1: pretrain + freeze the VAE (reference: pretrained SD
            # first stage), then train UNet+ControlNet on its latent space.
            # On --resume the checkpoint already holds the trained VAE —
            # re-pretraining would be 2500 wasted iters (r4)
            import jax.numpy as jnp

            from ddp_tpu.config import build_model

            vae_params, scale = pretrain_vae(cfg.model)
            # persist the measured scale so resume/eval-only runs rebuild
            # the model with the SAME latent scaling as training
            with open(os.path.join(cfg.runtime.workdir, "scale.json"),
                      "w") as f:
                json.dump({"cn_scale_factor": scale}, f)
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model,
                                               cn_scale_factor=scale))
            model = build_model(cfg.model)
            s = cfg.model.cn_image_size
            from ddp_tpu.data.controlnet_data import tokenize

            init_params = model.init(
                {"params": jax.random.PRNGKey(0),
                 "diffusion": jax.random.PRNGKey(1),
                 "dropout": jax.random.PRNGKey(2)},
                jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 3)),
                jnp.asarray(tokenize("")[None]), train=False)
            init_params["params"]["ldm"]["first_stage_model"] = vae_params
            print("injected pretrained VAE into first_stage_model",
                  flush=True)
        if name == "controlnet" and not resume:
            # procedural data → generate it ON DEVICE and scan the whole
            # run (train_controlnet_ondevice docstring has the relay math)
            variables = train_controlnet_ondevice(cfg, init_params)
        else:
            it = make_train_iter(cfg)
            state = train(cfg, it, init_params=init_params, resume=resume)
            variables = _variables_from_state(jax.device_get(state))

    if train_only:
        print(f"train-only done for {name}", flush=True)
        return {"preset": preset, "train_only": True}

    if name in ("seg", "seg_aligned", "seg_window", "seg_quarter",
                "seg_msda", "seg_aligned_msda", "seg_w16h4"):
        result = eval_seg(variables, cfg.model)
    elif name == "depth":
        result = eval_depth(variables, cfg.model)
    elif name == "bev_fusion":
        result = eval_bev_fusion(variables, cfg.model)
    elif name == "controlnet":
        result = eval_controlnet(variables, cfg.model, cfg.runtime.workdir)
    else:
        result = eval_bev(variables, cfg.model)
    result["preset"] = preset
    result["total_iters"] = cfg.runtime.total_iters
    path = os.path.join(cfg.runtime.workdir, "result.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {path}", flush=True)
    return result


def publish(results):
    """Merge convergence results into BASELINE.json 'published'."""
    path = os.path.join(os.path.dirname(__file__), "..", "BASELINE.json")
    base = json.load(open(path))
    pub = base.get("published") or {}
    pub["synthetic_convergence"] = results
    study = os.path.join(os.path.dirname(__file__), "..", "work_dirs",
                         "plateau_window.json")
    if os.path.exists(study):
        pub["decoder_horizon_study"] = json.load(open(study))
    base["published"] = pub
    with open(path, "w") as f:
        json.dump(base, f, indent=2)
    print(f"published to {path}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("experiments", nargs="*", default=["all"])
    p.add_argument("--publish", action="store_true")
    p.add_argument("--publish-only", action="store_true",
                   help="merge existing work_dirs/*/result.json into "
                        "BASELINE.json without running anything")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--train-only", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--iters", type=int, default=None,
                   help="override total_iters (smoke runs)")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    _setup_cache()

    names = args.experiments or ["all"]
    if names == ["all"] or names == []:
        names = ["seg", "seg_aligned", "depth", "bev", "bev_fusion",
                 "controlnet"]
    if args.publish_only:
        names, args.publish = [], True
    results = {}
    for n in names:
        results[n] = run_experiment(n, eval_only=args.eval_only,
                                    iters=args.iters,
                                    train_only=args.train_only,
                                    resume=args.resume)
    if args.publish:
        # fold previously-recorded experiments in too
        from ddp_tpu.config import get_config

        for n, preset in (("seg", "converge_seg"),
                          ("seg_aligned", "converge_seg_aligned"),
                          ("seg_window", "converge_seg_window"),
                          ("seg_quarter", "converge_seg_quarter"),
                          ("seg_msda", "converge_seg_msda"),
                          ("seg_aligned_msda", "converge_seg_aligned_msda"),
                          ("seg_w16h4", "converge_seg_w16h4"),
                          ("depth", "converge_depth"), ("bev", "converge_bev"),
                          ("bev_fusion", "converge_bev_fusion"),
                          ("controlnet", "converge_controlnet")):
            if n not in results:
                rp = os.path.join(get_config(preset).runtime.workdir,
                                  "result.json")
                if os.path.exists(rp):
                    results[n] = json.load(open(rp))
        publish(results)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
