"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric: 3-step DDIM denoise inference throughput on the flagship ADE20K
Swin-T DDPSegmentor at 512x512 (BASELINE.json config #1), in images/sec on
the local chip. ``vs_baseline`` compares against the reference's only
comparable published context (no throughput numbers exist in the reference —
SURVEY.md §6 — so the baseline is our own first recorded number; see
BASELINE_BENCH.json once recorded).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from ddp_tpu.core.diffusion import DiffusionConfig
    from ddp_tpu.models.segmentor import DDPSegmentor

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    size = int(os.environ.get("BENCH_SIZE", "512"))
    # bf16 inference is the production TPU configuration (params cast once,
    # LayerNorm statistics stay f32 inside flax); BENCH_DTYPE=f32 reproduces
    # the round-1 f32 baseline.
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[
        os.environ.get("BENCH_DTYPE", "bf16")]
    model = DDPSegmentor(
        num_classes=150,
        backbone_type="swin",
        backbone_variant="tiny",
        diffusion=DiffusionConfig(timesteps=3, randsteps=1, accumulation=True),
        drop_path_rate=0.0,
    )
    img = jnp.zeros((batch, size, size, 3), dtype)
    gt = jnp.zeros((batch, size, size), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        img[:1].astype(jnp.float32), gt[:1], train=False,
    )
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, variables)

    @jax.jit
    def forward_n(variables, img, rng, n):
        """Run n full 3-step DDIM inferences on-device inside ONE dispatch.

        A scalar checksum is the only host transfer, so relay/tunnel
        overhead (arg upload, async dispatch) stays out of the timed delta.
        n is a traced scalar -> fori_loop -> single compilation.
        """

        def body(i, acc):
            out = model.apply(variables, img,
                              method=model.sample,
                              rngs={"diffusion": jax.random.fold_in(rng, i)})
            return acc + jnp.sum(out).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    rng = jax.random.PRNGKey(7)

    def timed(n):
        t0 = time.perf_counter()
        float(forward_n(variables, img, rng, n))
        return time.perf_counter() - t0

    timed(1)  # warmup / compile
    n_small, n_big = 2, 2 + int(os.environ.get("BENCH_ITERS", "10"))
    t_small = timed(n_small)
    t_big = timed(n_big)
    per_iter = max((t_big - t_small) / (n_big - n_small), 1e-9)
    img_per_s = batch / per_iter

    baseline_path = os.path.join(os.path.dirname(__file__), "BASELINE_BENCH.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        try:
            base = json.load(open(baseline_path))["value"]
            vs = img_per_s / base
        except Exception:
            pass
    print(json.dumps({
        "metric": "ddim3_infer_img_per_s_swin_t_512",
        "value": round(img_per_s, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
