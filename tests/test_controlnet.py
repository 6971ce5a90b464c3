"""ControlNet / latent-diffusion stack tests (tiny configs, CPU).

Covers the reference surface from SURVEY.md §2 (ControlNet rows): UNet
forward, ControlNet zero-init behavior, ControlLDM loss + DDIM CFG sampling,
VAE roundtrip shapes, CLIP text encoder, DDPM schedule constants, EMA decay,
and add_control weight surgery.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ddp_tpu.models.controlnet import (ControlLDM, DDPMSchedule,
                                       add_control_from_sd,
                                       make_ddim_timesteps)
from ddp_tpu.nn.autoencoder import AutoencoderKL
from ddp_tpu.nn.clip_text import CLIPTextEncoder, dummy_ids
from ddp_tpu.nn.unet import ControlNet, UNetConfig, UNetModel

TINY = UNetConfig(in_channels=4, model_channels=32, out_channels=4,
                  num_res_blocks=1, attention_resolutions=(2,),
                  channel_mult=(1, 2), num_heads=2, context_dim=16)


def test_unet_forward_shape(rng):
    model = UNetModel(TINY)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.array([3.0, 100.0])
    ctx = jnp.zeros((2, 7, 16))
    params = model.init(rng, x, t, ctx)
    out = model.apply(params, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)


def test_ddpm_schedule_matches_reference_formula():
    """betas = linspace(sqrt(85e-5), sqrt(12e-3), 1000)^2 (ddpm.py:46+)."""
    s = DDPMSchedule()
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
    np.testing.assert_allclose(s.alphas_cumprod,
                               np.cumprod(1 - betas).astype(np.float32),
                               rtol=1e-6)
    # q_sample at t=0 is nearly clean; at t=999 nearly pure noise
    assert s.sqrt_alphas_cumprod[0] > 0.999
    assert s.sqrt_alphas_cumprod[-1] < 0.1


def test_ddim_timestep_grid():
    ts = make_ddim_timesteps(20, 1000)
    assert len(ts) == 20 and ts[0] == 1 and ts[-1] == 951


def test_controlnet_zero_init_residuals(rng):
    """Fresh ControlNet outputs exactly zero (zero convs, cldm.py:281-282),
    so an untrained ControlNet must not change the UNet prediction."""
    cn = ControlNet(TINY, hint_channels=3)
    x = jnp.ones((1, 16, 16, 4))
    hint = jnp.ones((1, 128, 128, 3))
    t = jnp.array([10.0])
    ctx = jnp.ones((1, 7, 16))
    params = cn.init(rng, x, hint, t, ctx)
    outs = cn.apply(params, x, hint, t, ctx)
    n_levels = len(TINY.channel_mult)
    n_skips = 1 + n_levels * TINY.num_res_blocks + (n_levels - 1)
    assert len(outs) == n_skips + 1  # skips + middle (13 for SD 1.5)
    for o in outs:
        assert float(jnp.abs(o).max()) == 0.0


def test_vae_roundtrip_shapes(rng):
    vae = AutoencoderKL(embed_dim=4, ch=16, ch_mult=(1, 2), num_res_blocks=1)
    x = jnp.zeros((1, 32, 32, 3))
    params = vae.init(rng, x, rng)
    recon, mean, logvar = vae.apply(params, x, rng)
    assert recon.shape == x.shape
    assert mean.shape == (1, 16, 16, 4)


def test_clip_text_encoder(rng):
    enc = CLIPTextEncoder(vocab_size=100, width=32, layers=2, heads=2,
                          max_len=8)
    ids = jnp.zeros((2, 8), jnp.int32)
    params = enc.init(rng, ids)
    out = enc.apply(params, ids)
    assert out.shape == (2, 8, 32)


def test_clip_causal_mask(rng):
    """Changing a later token must not affect earlier positions."""
    enc = CLIPTextEncoder(vocab_size=100, width=32, layers=2, heads=2,
                          max_len=8)
    ids = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32) % 100
    params = enc.init(rng, ids)
    out1 = enc.apply(params, ids)
    ids2 = ids.at[0, 6].set(55)
    out2 = enc.apply(params, ids2)
    np.testing.assert_allclose(out1[0, :6], out2[0, :6], atol=1e-5)
    assert float(jnp.abs(out1[0, 6:] - out2[0, 6:]).max()) > 1e-6


@pytest.fixture(scope="module")
def tiny_ldm():
    model = ControlLDM(unet=TINY, clip_width=16, clip_layers=1)
    img = jnp.zeros((1, 64, 64, 3))
    hint = jnp.zeros((1, 64, 64, 3))
    ids = jnp.asarray(dummy_ids(1, 8))
    params = model.init(jax.random.PRNGKey(0), jax.random.PRNGKey(1), img,
                        hint, ids)
    return model, params, img, hint, ids


def test_controlldm_loss(tiny_ldm):
    model, params, img, hint, ids = tiny_ldm
    losses = model.apply(params, jax.random.PRNGKey(2), img, hint, ids)
    assert np.isfinite(float(losses["loss"]))


def test_controlldm_ddim_cfg_sample(tiny_ldm):
    model, params, img, hint, ids = tiny_ldm
    out = model.apply(params, jax.random.PRNGKey(3), hint, ids, ids,
                      method=model.sample, steps=3, guidance_scale=2.0)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_add_control_weight_surgery(rng):
    unet = UNetModel(TINY)
    cn = ControlNet(TINY, hint_channels=3)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.array([0.0])
    ctx = jnp.zeros((1, 7, 16))
    hint = jnp.zeros((1, 128, 128, 3))
    up = unet.init(rng, x, t, ctx)["params"]
    cp = cn.init(jax.random.PRNGKey(9), x, hint, t, ctx)["params"]
    merged = add_control_from_sd(up, cp)
    got = jax.tree_util.tree_leaves(merged["encoder"])
    want = jax.tree_util.tree_leaves(up["encoder"])
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # zero convs untouched (still zero)
    assert float(jnp.abs(merged["middle_out"]["kernel"]).max()) == 0.0


def test_ema_update():
    from ddp_tpu.train.ema import ema_init, ema_update

    params = {"w": jnp.ones((4,))}
    state = ema_init(params)
    new_params = {"w": jnp.zeros((4,))}
    state = ema_update(state, new_params, decay=0.9999)
    # warmup: d = min(0.9999, 2/11)
    np.testing.assert_allclose(np.asarray(state[0]["w"]),
                               np.full((4,), 2.0 / 11.0), rtol=1e-6)


def test_controlnet_trainer_step_and_data():
    """tutorial_train.py equivalent: the fill50k synthetic batch through the
    framework train step (ControlNetTrainer adapter)."""
    import numpy as np

    from ddp_tpu.config import build_model, get_config
    from ddp_tpu.data import make_train_iter
    from ddp_tpu.train.optim import make_optimizer
    from ddp_tpu.train.state import TrainState, make_train_step

    from ddp_tpu.config import apply_overrides

    # pin the CPU test to the 'tiny' stack (the preset's 'small' UNet is a
    # chip-budget choice, not a different code path) + a known scale factor
    cfg = get_config("converge_controlnet")
    cfg = apply_overrides(cfg, {"model.cn_size": "tiny",
                                "model.cn_scale_factor": 0.5})
    model = build_model(cfg.model)
    assert model.scale_factor == 0.5  # preset plumbing reaches the module
    it = make_train_iter(cfg)
    batch = next(it)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        jnp.asarray(batch["image"][:1]), jnp.asarray(batch["hint"][:1]),
        jnp.asarray(batch["ids"][:1]), train=False)
    tx = make_optimizer(cfg.optim, variables["params"])
    state = TrainState.create(variables["params"], tx, {}, jax.random.PRNGKey(2))
    step = make_train_step(model, tx, mesh=None, donate=False,
                           batch_keys=("image", "hint", "ids"))
    state, logs = step(state, {k: jnp.asarray(v[:2]) for k, v in batch.items()})
    assert np.isfinite(float(logs["loss"]))
    assert int(state.step) == 1


def test_device_fill50k_matches_numpy_family():
    """The on-device jnp generator (device_fill50k_batch) must produce the
    same data contract as SyntheticFill50k.load: value ranges, the
    outline-ring hint geometry, flat two-color images, and EXACTLY the
    tokenizer's ids layout for the rendered color pair."""
    import numpy as np

    from ddp_tpu.data.controlnet_data import (COLORS, VOCAB,
                                              SyntheticFill50k,
                                              device_fill50k_batch, tokenize)

    img, hint, ids = jax.jit(
        lambda k: device_fill50k_batch(k, 4, 64))(jax.random.PRNGKey(7))
    img, hint, ids = np.asarray(img), np.asarray(hint), np.asarray(ids)
    assert img.shape == (4, 64, 64, 3) and hint.shape == (4, 64, 64, 3)
    assert ids.shape == (4, 77) and ids.dtype == np.int32
    assert -1.0 <= img.min() and img.max() <= 1.0
    assert set(np.unique(hint)) <= {0.0, 1.0}
    for i in range(4):
        # image uses exactly two palette colors (fill + bg), like the loader
        px = np.unique(np.round((img[i] + 1.0) * 127.5).reshape(-1, 3),
                       axis=0)
        assert px.shape[0] == 2
        # ids row == tokenize() of the prompt the colors imply
        c0 = VOCAB[COLORS[0][0]]
        fill = COLORS[ids[i, 1] - c0][0]
        bg = COLORS[ids[i, 4] - c0][0]
        assert fill != bg
        np.testing.assert_array_equal(
            ids[i], tokenize(f"{fill} circle with {bg} background"))
        # the hint ring lies on the fill/bg boundary of the image
        ring = hint[i, :, :, 0] > 0.5
        assert ring.any()

    # numpy loader, same contract
    s = SyntheticFill50k(size=64).load(3)
    assert s["image"].shape == img.shape[1:]
    assert s["ids"].shape == ids.shape[1:]


def test_train_controlnet_ondevice_smoke(tmp_path):
    """The harness's on-device-data training path (chunked lax.scan over
    device_fill50k_batch): loss finite and falling-ish over 6 tiny steps,
    log + checkpoint written, checkpoint restorable by _restore_variables."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from run_convergence import _restore_variables, train_controlnet_ondevice

    from ddp_tpu.config import apply_overrides, get_config
    from ddp_tpu.config import build_model
    from ddp_tpu.data.controlnet_data import tokenize

    cfg = get_config("converge_controlnet")
    cfg = apply_overrides(cfg, {
        "model.cn_size": "tiny", "model.cn_scale_factor": 1.0,
        "data.batch_size": 2, "runtime.total_iters": 6,
        "optim.total_steps": 6, "runtime.workdir": str(tmp_path)})
    model = build_model(cfg.model)
    s = cfg.model.cn_image_size
    init = model.init({"params": jax.random.PRNGKey(0),
                       "diffusion": jax.random.PRNGKey(1),
                       "dropout": jax.random.PRNGKey(2)},
                      jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 3)),
                      jnp.asarray(tokenize("")[None]), train=False)
    train_controlnet_ondevice(cfg, init, chunk=3)

    log = os.path.join(str(tmp_path), "train_log.jsonl")
    assert os.path.exists(log)
    import json as _json

    recs = [_json.loads(l) for l in open(log)]
    assert [r["step"] for r in recs] == [3, 6]
    assert all(np.isfinite(r["loss"]) for r in recs)

    variables, step = _restore_variables(cfg)
    assert step == 6
    # params actually moved from init
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        variables["params"]["ldm"]["control_model"],
        init["params"]["ldm"]["control_model"])
    assert max(jax.tree_util.tree_leaves(d)) > 0.0
