"""Measured breakdown of the flagship train step (VERDICT r3 item 4).

The sandboxed TPU relay cannot return device xplane traces, so the breakdown is
measured by SUBTRACTION: each variant removes one component from the
published train configuration (window decoder, b4, remat, bf16 policy) and
is timed with the same on-device fori_loop discipline as bench.py. Deltas
against the full step attribute wall-clock to components; XLA cost-analysis
FLOPs (CPU-lowered subprocess, same as bench.py) give per-variant MFU.

Variants:
  full           — the published configuration (bench.py train row)
  quarter_loss   — CE at the decoder's 1/4 grid (no 512²x150 f32 upsample)
  no_aux         — aux FCN head skipped (weight 0 short-circuits compute)
  quarter_noaux  — both
  no_remat       — decoder activations stored, not recomputed
  fwd_only       — loss value only (no backward/optimizer): bwd+opt share
  encoder_bwd    — fwd+bwd through backbone+neck only: encoder share

Writes work_dirs/mfu_breakdown.json; the narrative lives in
ddp_tpu/ops/pallas/train_profile_notes.md.

Usage: python tools/mfu_breakdown.py [--batch 4] [--size 512]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _model(size, attn="window", remat=True, loss_at="full", aux=0.4):
    from ddp_tpu.core.diffusion import DiffusionConfig
    from ddp_tpu.models.segmentor import DDPSegmentor

    return DDPSegmentor(
        num_classes=150, backbone_type="swin", backbone_variant="tiny",
        diffusion=DiffusionConfig(timesteps=3, randsteps=1, accumulation=True),
        drop_path_rate=0.0, decoder_attn=attn, decoder_remat=remat,
        loss_at=loss_at, aux_weight=aux)


def _build(size, batch, **kw):
    from ddp_tpu.train.optim import OptimConfig, make_optimizer
    from ddp_tpu.train.state import TrainState, make_train_step

    model = _model(size, **kw)
    img0 = jnp.zeros((1, size, size, 3), jnp.float32)
    gt0 = jnp.zeros((1, size, size), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, img0, gt0, train=False)
    tx = make_optimizer(OptimConfig(total_steps=1000, warmup_steps=0),
                        variables["params"])
    state = TrainState.create(variables["params"], tx,
                              variables.get("batch_stats", {}),
                              jax.random.PRNGKey(3))
    step = make_train_step(model, tx, mesh=None, donate=False,
                           mixed_precision=True, jit=False)
    rng = np.random.RandomState(0)
    batch_dev = {
        "image": jnp.asarray(rng.randn(batch, size, size, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 150, (batch, size, size)),
                             jnp.int32)}
    return model, step, state, batch_dev


def timed_loop(fn, *args, iters=5):
    def timed(n):
        t0 = time.perf_counter()
        float(fn(*args, n))
        return time.perf_counter() - t0

    for attempt in range(3):
        try:
            timed(1)
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(5)
    t_small = timed(2)
    t_big = timed(2 + iters)
    return max((t_big - t_small) / iters, 1e-9)


def time_train(size, batch, **kw):
    _, step, state, batch_dev = _build(size, batch, **kw)

    @jax.jit
    def train_n(state, batch, n):
        def body(i, st):
            st2, _ = step(st, batch)
            return st2

        st = jax.lax.fori_loop(0, n, body, state)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), st.params,
            jnp.float32(0))

    return timed_loop(train_n, state, batch_dev)


def time_fwd_only(size, batch, **kw):
    model, _, state, batch_dev = _build(size, batch, **kw)

    @jax.jit
    def fwd_n(state, batch, rng, n):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

        def body(i, acc):
            (loss, _), _ = model.apply(
                variables, batch["image"].astype(jnp.bfloat16),
                batch["label"], train=True, mutable=["batch_stats"],
                rngs={"diffusion": jax.random.fold_in(rng, i),
                      "dropout": jax.random.fold_in(rng, i + 999)})
            return acc + loss.astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    return timed_loop(fwd_n, state, batch_dev, jax.random.PRNGKey(5))


def time_encoder_bwd(size, batch):
    model, _, state, batch_dev = _build(size, batch)

    @jax.jit
    def enc_n(params, batch, n):
        def loss_fn(p, img):
            feat = model.apply({"params": p}, img.astype(jnp.bfloat16),
                               train=False,
                               method=model.extract_feat)
            return jnp.sum(feat.astype(jnp.float32) ** 2)

        def body(i, acc):
            g = jax.grad(loss_fn)(params, batch["image"])
            return acc + jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.float32)), g,
                jnp.float32(0))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    return timed_loop(enc_n, state.params, batch_dev)


def flops_of(size, batch, **kw):
    """XLA cost-model FLOPs of the full train step, CPU-lowered subprocess
    (the relay backend returns no cost analysis — bench.py discipline)."""
    import subprocess

    code = ("import jax; jax.config.update('jax_platforms','cpu')\n"
            "import sys; sys.path.insert(0, '.')\n"
            "from tools import mfu_breakdown as m\n"
            f"_, step, state, batch = m._build({size}, {batch}, **{kw!r})\n"
            "cost = jax.jit(lambda s, b: step(s, b)[0]).lower("
            "state, batch).cost_analysis()\n"
            "print('FLOPS', cost.get('flops', 0.0))\n")
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=900, cwd=os.path.join(os.path.dirname(__file__), ".."))
        for line in out.stdout.splitlines():
            if line.startswith("FLOPS "):
                return float(line.split()[1])
    except Exception:
        pass
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--skip", nargs="*", default=[])
    args = p.parse_args()
    size, batch = args.size, args.batch

    peak = 197e12  # v5e dense bf16
    path = os.path.join("work_dirs", "mfu_breakdown.json")
    rows = {}
    if os.path.exists(path):  # merge: keep rows from earlier partial runs
        rows = json.load(open(path)).get("rows", {})

    variants = [
        ("full", dict()),
        ("quarter_loss", dict(loss_at="quarter")),
        ("no_aux", dict(aux=0.0)),
        ("quarter_noaux", dict(loss_at="quarter", aux=0.0)),
        ("no_remat", dict(remat=False)),
    ]
    for name, kw in variants:
        if name in args.skip or isinstance(rows.get(name), dict) and \
                "ms_per_step" in rows[name]:
            continue
        try:
            t = time_train(size, batch, **kw)
            f = flops_of(size, batch, **kw)
            rows[name] = {"ms_per_step": round(t * 1e3, 1),
                          "steps_per_s": round(1 / t, 3)}
            if f:
                rows[name]["tflops_per_step"] = round(f / 1e12, 3)
                rows[name]["mfu"] = round(f / t / peak, 4)
        except Exception as e:
            rows[name] = {"error": f"{type(e).__name__}: {e}"}
        print(name, "->", json.dumps(rows[name]), flush=True)

    for name, fn in (("fwd_only", time_fwd_only),
                     ("encoder_bwd", time_encoder_bwd)):
        if name in args.skip or isinstance(rows.get(name), dict) and \
                "ms_per_step" in rows[name]:
            continue
        try:
            t = fn(size, batch)
            rows[name] = {"ms_per_step": round(t * 1e3, 1)}
        except Exception as e:
            rows[name] = {"error": f"{type(e).__name__}: {e}"}
        print(name, "->", json.dumps(rows[name]), flush=True)

    out = {"batch": batch, "size": size,
           "chip": getattr(jax.devices()[0], "device_kind", "?"),
           "date": time.strftime("%Y-%m-%d"), "rows": rows}
    os.makedirs("work_dirs", exist_ok=True)
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
