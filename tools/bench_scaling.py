"""Grad-sync overhead proxy on the virtual CPU mesh (VERDICT r3 item 10).

Real multi-chip hardware is not available in this environment, so absolute
scaling (steps/s at N chips) cannot be measured. What CAN be measured on the
8-virtual-device CPU mesh is the OVERHEAD the data-parallel machinery adds
on top of the raw compute:

  With fixed per-device batch b, the 2-core host executes N*b images of
  compute per step regardless of mesh width, so ideal step time is
  t_ideal(N) = N * t(1). The measured excess
      overhead(N) = (t(N) - N * t(1)) / t(N)
  is the cost of the psum gradient reduction + cross-shard fusion that the
  sharded step adds — the only signal this environment can produce toward
  the "≥80% linear scaling 1→4 hosts" target (BASELINE.json). On real ICI
  the collective is far faster than this host-emulated one, so the fraction
  is an upper bound.

Writes work_dirs/scaling_proxy.json and merges a summary into
BENCH_EXTRA.json under "grad_sync_proxy".

Run on a QUIET host (the numbers are wall-clock):
  python tools/bench_scaling.py [--batch 2] [--hw 64] [--iters 20]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def build(n_dev, batch_per_dev, hw):
    from ddp_tpu.core.diffusion import DiffusionConfig
    from ddp_tpu.models.segmentor import DDPSegmentor
    from ddp_tpu.parallel.mesh import make_mesh, shard_batch
    from ddp_tpu.train.optim import OptimConfig, make_optimizer
    from ddp_tpu.train.state import TrainState, make_train_step

    model = DDPSegmentor(
        num_classes=5, backbone_type="convnext", backbone_variant="nano",
        embed_dims=32, decoder_layers=2, decoder_heads=4, decoder_ffn_dim=64,
        diffusion=DiffusionConfig(timesteps=1), drop_path_rate=0.0)
    rng = np.random.RandomState(0)
    g = n_dev * batch_per_dev
    batch = {"image": jnp.asarray(rng.randn(g, hw, hw, 3), jnp.float32),
             "label": jnp.asarray(rng.randint(0, 5, (g, hw, hw)), jnp.int32)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch["image"][:1], batch["label"][:1], train=False)
    tx = make_optimizer(OptimConfig(lr=1e-4, total_steps=1000,
                                    warmup_steps=0), variables["params"])
    state = TrainState.create(variables["params"], tx,
                              variables.get("batch_stats", {}),
                              jax.random.PRNGKey(3))
    if n_dev == 1:
        step = make_train_step(model, tx, mesh=None, donate=False)
        return step, state, batch
    mesh = make_mesh(n_data=n_dev, devices=jax.devices()[:n_dev])
    step = make_train_step(model, tx, mesh=mesh, donate=False)
    return step, state, shard_batch(mesh, batch)


def timeit(step, state, batch, iters):
    st, logs = step(state, batch)  # compile + warmup
    jax.block_until_ready(st.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        st, logs = step(st, batch)
    jax.block_until_ready(st.params)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2, help="per-device batch")
    p.add_argument("--hw", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    rows = {}
    for n in (1, 2, 4, 8):
        step, state, batch = build(n, args.batch, args.hw)
        t = timeit(step, state, batch, args.iters)
        rows[n] = t
        print(f"mesh={n}: {t * 1000:.1f} ms/step "
              f"(global batch {n * args.batch})", flush=True)

    t1 = rows[1]
    out = {"per_device_batch": args.batch, "hw": args.hw,
           "host": "2-core CPU, 8 virtual devices",
           "step_ms": {str(n): round(t * 1000, 2) for n, t in rows.items()},
           "overhead_fraction": {}, "note": (
               "overhead(N) = (t(N) - N*t(1))/t(N): the cost the sharded "
               "step adds beyond raw compute on a fixed-core host. This is "
               "the only scaling signal a single-chip environment can "
               "produce toward the >=80%-linear-scaling target; on real ICI "
               "the collective is faster than this host-emulated gloo-less "
               "psum, so treat it as an upper bound.")}
    for n, t in rows.items():
        if n == 1:
            continue
        ov = (t - n * t1) / t
        out["overhead_fraction"][str(n)] = round(float(ov), 4)
        print(f"mesh={n}: sync overhead fraction {ov:+.3f}")

    os.makedirs("work_dirs", exist_ok=True)
    path = os.path.join("work_dirs", "scaling_proxy.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}")

    extra = os.path.join(os.path.dirname(__file__), "..", "BENCH_EXTRA.json")
    if os.path.exists(extra):
        blob = json.load(open(extra))
        blob.setdefault("rows", blob.get("rows", {}))
        blob["rows"]["grad_sync_proxy"] = out
        json.dump(blob, open(extra, "w"), indent=1)
        print(f"merged into {extra}")


if __name__ == "__main__":
    main()
