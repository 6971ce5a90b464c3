"""Real multi-device DP training tests on the 8-virtual-device CPU mesh —
the coverage the reference never had (SURVEY.md §4: mocked distributed only)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.core.diffusion import DiffusionConfig
from ddp_tpu.models.segmentor import DDPSegmentor
from ddp_tpu.parallel.mesh import make_mesh, shard_batch
from ddp_tpu.train.optim import OptimConfig, make_optimizer, make_lr_schedule
from ddp_tpu.train.state import TrainState, make_train_step


def tiny_model():
    return DDPSegmentor(
        num_classes=5,
        backbone_type="convnext",
        backbone_variant="nano",
        embed_dims=32,
        decoder_layers=2,
        decoder_heads=4,
        decoder_ffn_dim=64,
        diffusion=DiffusionConfig(timesteps=1),
        drop_path_rate=0.0,
    )


def make_batch(n=8, hw=32):
    rng = np.random.RandomState(0)
    return {
        "image": jnp.asarray(rng.randn(n, hw, hw, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 5, (n, hw, hw)), jnp.int32),
    }


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    batch = make_batch(2)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch["image"][:1], batch["label"][:1], train=False,
    )
    cfg = OptimConfig(lr=1e-3, total_steps=100, warmup_steps=0)
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx,
                              variables.get("batch_stats", {}),
                              jax.random.PRNGKey(3))
    return model, tx, state


def test_single_device_step_decreases_loss(setup):
    model, tx, state = setup
    step = make_train_step(model, tx, mesh=None, donate=False)
    batch = make_batch(2)
    losses = []
    for _ in range(3):
        state, logs = step(state, batch)
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    assert int(state.step) == 3


def test_mesh_train_step_runs_on_8_devices(setup):
    model, tx, state = setup
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    step = make_train_step(model, tx, mesh=mesh, donate=False)
    batch = shard_batch(mesh, make_batch(8))
    state2, logs = step(state, batch)
    assert np.isfinite(float(logs["loss"]))
    assert float(logs["grad_norm"]) > 0


def test_mesh_matches_single_device_grads(setup):
    """DP on 8 devices must equal single-device math on the same global batch."""
    model, tx, state = setup
    batch = make_batch(8)
    step1 = make_train_step(model, tx, mesh=None, donate=False)
    s1, logs1 = step1(state, batch)

    mesh = make_mesh()
    stepN = make_train_step(model, tx, mesh=mesh, donate=False)
    sN, logsN = stepN(state, shard_batch(mesh, batch))
    np.testing.assert_allclose(float(logs1["loss"]), float(logsN["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(logs1["grad_norm"]), float(logsN["grad_norm"]),
                               rtol=1e-4)
    # parameters after one update agree
    l1 = jax.tree_util.tree_leaves(s1.params)
    lN = jax.tree_util.tree_leaves(sN.params)
    for a, b in zip(l1, lN):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_lr_schedule_poly_warmup():
    cfg = OptimConfig(lr=6e-5, total_steps=160_000, warmup_steps=1500,
                      warmup_ratio=1e-6, schedule="poly", power=1.0)
    sched = make_lr_schedule(cfg)
    assert float(sched(0)) == pytest.approx(6e-5 * 1e-6, rel=1e-3)
    assert float(sched(1500)) == pytest.approx(6e-5 * (1 - 1500 / 160_000), rel=1e-3)
    assert float(sched(160_000)) == pytest.approx(0.0, abs=1e-12)


def test_weight_decay_mask(setup):
    """Norm/bias params must not be weight-decayed (custom_keys norm decay 0)."""
    model, tx, state = setup
    params = state.params
    from ddp_tpu.train.optim import _path_str, _rule_for, OptimConfig as OC

    cfg = OC()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    checked_bias = checked_kernel = False
    for path, leaf in flat:
        p = _path_str(path)
        lr_mult, decay = _rule_for(p, leaf, cfg.custom_keys)
        if "bias" in p:
            assert decay == 0.0, p
            checked_bias = True
        if "pwconv1/kernel" in p:
            assert decay == 1.0, p
            checked_kernel = True
    assert checked_bias and checked_kernel


def test_mixed_precision_bf16_matches_f32(setup):
    """bf16 policy (runtime.mixed_precision): loss close to f32, params stay
    f32, grads finite — the Fp16OptimizerHook equivalent (VERDICT item 5)."""
    model, tx, state = setup
    batch = make_batch(2)
    step_f32 = make_train_step(model, tx, mesh=None, donate=False)
    step_bf16 = make_train_step(model, tx, mesh=None, donate=False,
                                mixed_precision=True)
    s32, logs32 = step_f32(state, batch)
    s16, logs16 = step_bf16(state, batch)
    l32, l16 = float(logs32["loss"]), float(logs16["loss"])
    assert np.isfinite(l16)
    assert abs(l16 - l32) / max(abs(l32), 1e-6) < 0.05
    # master params stay f32 after the update
    for leaf in jax.tree_util.tree_leaves(s16.params):
        assert leaf.dtype == jnp.float32
    assert float(logs16["grad_norm"]) > 0


def test_cyclic_lr_and_momentum_schedule():
    """BEV one-cycle schedule (bev seg/default.yaml lr_config +
    momentum_config): lr rises to lr*10 at 40% then anneals to lr*1e-4;
    b1 dips inversely while lr peaks."""
    from ddp_tpu.train.optim import make_momentum_schedule

    cfg = OptimConfig(lr=1e-4, schedule="cyclic", total_steps=1000,
                      cyclic_target_ratio=(10.0, 1e-4),
                      cyclic_step_ratio_up=0.4)
    sched = make_lr_schedule(cfg)
    assert float(sched(0)) == pytest.approx(1e-4, rel=1e-3)
    assert float(sched(400)) == pytest.approx(1e-3, rel=1e-3)  # peak lr*10
    assert float(sched(1000)) == pytest.approx(1e-8, rel=1e-2)  # lr*1e-4
    assert float(sched(200)) > float(sched(0))
    m = make_momentum_schedule(cfg)
    b1 = cfg.betas[0]
    assert float(m(0)) == pytest.approx(b1, rel=1e-3)
    assert float(m(400)) == pytest.approx(b1 * 0.8947368421, rel=1e-3)
    assert float(m(1000)) == pytest.approx(b1, rel=1e-3)


def test_cyclic_optimizer_steps(setup):
    """The cyclic chain (inject_hyperparams momentum) must update params."""
    model, _, state = setup
    cfg = OptimConfig(lr=1e-3, schedule="cyclic", total_steps=100,
                      grad_clip=1.0)
    tx = make_optimizer(cfg, state.params)
    st = TrainState.create(state.params, tx, state.batch_stats,
                           jax.random.PRNGKey(0))
    step = make_train_step(model, tx, mesh=None, donate=False)
    batch = make_batch(2)
    st2, logs = step(st, batch)
    assert np.isfinite(float(logs["loss"]))
    # params moved
    moved = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(st.params),
        jax.tree_util.tree_leaves(st2.params)))
    assert moved > 0


def test_chunked_dispatch_matches_per_step(setup):
    """spd-step lax.scan dispatch must be bit-equivalent to spd python-loop
    dispatches (same rng folding, same optimizer math)."""
    from ddp_tpu.parallel.mesh import shard_batch_chunk
    from ddp_tpu.train.state import make_chunked_train_step

    model, tx, state = setup
    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    batches = [make_batch(4) for _ in range(4)]
    # reference: per-step dispatches
    step = make_train_step(model, tx, mesh=mesh, donate=False)
    s_ref = state
    for b in batches:
        s_ref, logs_ref = step(s_ref, shard_batch(mesh, b))
    # chunked: one scan dispatch
    chunk = make_chunked_train_step(model, tx, 4, mesh=mesh)
    stacked = {k: np.stack([np.asarray(b[k]) for b in batches])
               for k in ("image", "label")}
    s_chunk, logs = chunk(jax.device_get(state),
                          shard_batch_chunk(mesh, stacked))
    assert int(s_chunk.step) == int(s_ref.step)
    # stacked logs expose every in-chunk step; last must equal the ref's last
    np.testing.assert_allclose(float(np.asarray(logs["loss"])[-1]),
                               float(logs_ref["loss"]), rtol=1e-4)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a, np.float32)
                                         - np.asarray(b, np.float32)))),
        s_ref.params, s_chunk.params)
    # scan vs python-loop dispatch reassociates fusions; tiny fp drift ok
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-4


def test_train_loop_chunked_runs(tmp_path):
    """The real train() loop with steps_per_dispatch>1 (tail chunk included):
    intervals honored, loss finite, step count exact."""
    import dataclasses as dc
    import json
    import os

    from ddp_tpu.config import get_config
    from ddp_tpu.data import make_train_iter
    from ddp_tpu.train.loop import train

    cfg = get_config("converge_seg")
    cfg = dc.replace(
        cfg,
        model=dc.replace(cfg.model, backbone_variant="nano", embed_dims=32,
                         decoder_layers=1, decoder_heads=4,
                         decoder_ffn_dim=64),
        data=dc.replace(cfg.data, batch_size=4, crop_size=(32, 32)),
        optim=dc.replace(cfg.optim, total_steps=7, warmup_steps=0),
        runtime=dc.replace(cfg.runtime, total_iters=7, log_interval=2,
                           ckpt_interval=100, eval_interval=100,
                           steps_per_dispatch=3, tensorboard=False,
                           workdir=str(tmp_path)))
    state = train(cfg, make_train_iter(cfg))
    assert int(state.step) == 7
    logs = [json.loads(l) for l in open(os.path.join(tmp_path,
                                                     "train_log.jsonl"))]
    steps_logged = [l["step"] for l in logs]
    assert 6 in steps_logged  # interval crossing inside a chunk
    assert all(np.isfinite(l["loss"]) for l in logs)
