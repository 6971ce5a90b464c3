"""Capture a JAX profiler trace of the flagship model — the TPU-native
replacement for the reference's tools/benchmark.py + get_flops.py pair
(SURVEY.md §5: "jax profiler traces + a steps/sec/chip benchmark harness").

Writes a TensorBoard-loadable trace (xplane) under --logdir and prints
wall-clock per step. View with `tensorboard --logdir <dir>` (profile tab) or
xprof. Works on TPU and CPU backends.

Usage:
  python tools/profile.py [--mode infer|train] [--steps 3] [--batch 4]
                          [--size 512] [--logdir work_dirs/profile]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="infer", choices=["infer", "train"])
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--logdir", default="work_dirs/profile")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ddp_tpu.core.diffusion import DiffusionConfig
    from ddp_tpu.models.segmentor import DDPSegmentor

    model = DDPSegmentor(
        num_classes=150, backbone_type="swin", backbone_variant="tiny",
        diffusion=DiffusionConfig(timesteps=3), drop_path_rate=0.0)
    img = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)
    gt = jnp.zeros((args.batch, args.size, args.size), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, img[:1], gt[:1], train=False)

    if args.mode == "infer":
        @jax.jit
        def step(variables, img, rng):
            return model.apply(variables, img, method=model.sample,
                               rngs={"diffusion": rng})

        run = lambda i: step(variables, img, jax.random.PRNGKey(i)
                             ).block_until_ready()
    else:
        from ddp_tpu.train.optim import OptimConfig, make_optimizer
        from ddp_tpu.train.state import TrainState, make_train_step

        tx = make_optimizer(OptimConfig(total_steps=100, warmup_steps=0),
                            variables["params"])
        state = TrainState.create(variables["params"], tx,
                                  variables.get("batch_stats", {}),
                                  jax.random.PRNGKey(3))
        step = make_train_step(model, tx, mesh=None, donate=False,
                               mixed_precision=True)
        batch = {"image": img, "label": gt}
        holder = {"state": state}

        def run(i):
            holder["state"], logs = step(holder["state"], batch)
            jax.block_until_ready(logs["loss"])

    run(0)  # compile outside the trace
    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        for i in range(args.steps):
            t0 = time.perf_counter()
            run(i + 1)
            print(f"step {i}: {time.perf_counter() - t0:.3f}s", flush=True)
    print(f"trace written to {args.logdir}", flush=True)


if __name__ == "__main__":
    main()
