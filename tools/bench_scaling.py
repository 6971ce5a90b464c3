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
    # a 1-device MESH (not plain jit) as the baseline: the sharded-jit path
    # on virtual CPU devices has its own fixed costs (per-device thread
    # pools, partitioned executables) that plain jit doesn't pay — the
    # baseline must pay them too or the deltas are methodology noise
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

    # least-squares fit t(N) = fixed + marginal*N: on a fixed-core host the
    # compute term scales with N (total work grows with fixed per-device
    # batch), so `marginal` bounds compute+per-shard-sync cost and `fixed`
    # is the mesh-width-INDEPENDENT partitioned-runtime overhead. The
    # mesh-width-dependent growth is the only scaling signal a single-chip
    # environment can produce toward the >=80%-linear target.
    ns = np.asarray(sorted(rows), np.float64)
    ts = np.asarray([rows[int(n)] * 1000 for n in ns])
    A = np.stack([np.ones_like(ns), ns], axis=1)
    (fixed, marginal), *_ = np.linalg.lstsq(A, ts, rcond=None)
    growth = {f"{int(a)}to{int(b)}": round(rows[int(b)] / rows[int(a)] - 1, 4)
              for a, b in zip(ns[:-1], ns[1:])}
    out = {"per_device_batch": args.batch, "hw": args.hw,
           "host": "2-core CPU, 8 virtual devices",
           "step_ms": {str(int(n)): round(rows[int(n)] * 1000, 2)
                       for n in ns},
           "fit_fixed_ms": round(float(fixed), 1),
           "fit_marginal_ms_per_shard": round(float(marginal), 1),
           "step_growth_per_mesh_doubling": growth,
           "note": (
               "Fixed per-device batch on a fixed-core host: total compute "
               "grows with mesh width N, so t(N) ~= fixed + marginal*N. "
               "Step-time growth per mesh doubling (8x total work -> "
               f"{rows[8] / rows[1] - 1:+.0%} total) bounds the "
               "width-dependent sync cost; the large `fixed` term is the "
               "host-emulated partitioned-runtime overhead that real ICI "
               "does not pay. This is the only scaling signal a "
               "single-chip environment can produce toward the >=80%-"
               "linear-scaling target.")}
    print(f"fit: t(N) = {fixed:.0f} + {marginal:.0f}*N ms; "
          f"growth per doubling {growth}")

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
