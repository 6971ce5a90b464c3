"""End-to-end test of the camera+lidar fusion model at nano scale."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ddp_tpu import native
from ddp_tpu.core.diffusion import DiffusionConfig
from ddp_tpu.models.bev_fusion import DDPBEVFusion
from ddp_tpu.nn.sparse_conv import (build_sparse_encoder_rulebooks,
                                    mean_voxel_features)

# camera: xbound 0.5 over ±8m -> 32 cells, LSS downsample 2 -> 16² BEV
# lidar: sparse_shape (128,128,41) at 0.125m -> /8 spatial -> 16² dense ✓
NANO = dict(
    num_classes=3,
    embed_dims=32,
    backbone_variant="nano",
    image_size=(32, 64),
    out_grid=20,
    input_scope=((-8.0, 8.0, 1.0), (-8.0, 8.0, 1.0)),
    output_scope=((-8.0, 8.0, 0.8), (-8.0, 8.0, 0.8)),
    xbound=(-8.0, 8.0, 0.5), ybound=(-8.0, 8.0, 0.5),
    zbound=(-10.0, 10.0, 20.0), dbound=(1.0, 9.0, 1.0),
    lss_out_channels=16,
    lidar_channels=24,
    lidar_dense_hw=16,
    lidar_dense_z=2,
    bev_blocks=((1, 24, 2), (1, 32, 1)),
    decoder_layers=1,
    decoder_heads=4,
    decoder_ffn_dim=64,
    diffusion=DiffusionConfig(timesteps=2, randsteps=1),
    drop_path_rate=0.0,
)
SPARSE_SHAPE = (128, 128, 41)
CAPS = (512, 256, 128, 96, 96)
PC_RANGE = (-8.0, -8.0, -5.0, 8.0, 8.0, 3.2)
VOXEL_SIZE = (0.125, 0.125, 0.2)


def make_lidar_sample(seed, n_points=600):
    rng = np.random.default_rng(seed)
    pts = np.zeros((n_points, 5), np.float32)
    pts[:, 0] = rng.uniform(-8, 8, n_points)
    pts[:, 1] = rng.uniform(-8, 8, n_points)
    pts[:, 2] = rng.uniform(-4, 2, n_points)
    pts[:, 3] = rng.uniform(0, 1, n_points)
    voxels, coords, counts, nv = native.hard_voxelize(
        pts, PC_RANGE, VOXEL_SIZE, max_points=4, max_voxels=CAPS[0])
    feats = mean_voxel_features(voxels, counts)
    rbs = build_sparse_encoder_rulebooks(coords, nv, SPARSE_SHAPE, CAPS)
    return feats, rbs


def _camera_rig(b, n):
    intr = np.zeros((b, n, 3, 3), np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = 38.0
    intr[..., 0, 2] = 31.5
    intr[..., 1, 2] = 15.5
    intr[..., 2, 2] = 1.0
    look = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32).T
    rots = np.tile(look, (b, n, 1, 1)).astype(np.float32)
    trans = np.zeros((b, n, 3), np.float32)
    eye = np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1))
    zero = np.zeros((b, n, 3), np.float32)
    return tuple(jnp.asarray(a) for a in (rots, trans, intr, eye, zero))


@pytest.fixture(scope="module")
def fusion_setup():
    b, n = 2, 2
    model = DDPBEVFusion(**NANO)
    rig = _camera_rig(b, n)
    img = jnp.zeros((b, n, 32, 64, 3))
    feats, rbs = [], []
    for i in range(b):
        f, r = make_lidar_sample(i)
        feats.append(f)
        rbs.append(r)
    voxel_feats = jnp.asarray(np.stack(feats))
    rulebooks = {k: jnp.asarray(np.stack([r[k] for r in rbs])) for k in rbs[0]}
    gt = jnp.zeros((b, 20, 20, 3), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        img, *rig, voxel_feats, rulebooks, gt, train=False)
    return model, variables, rig, voxel_feats, rulebooks


def test_fusion_train_loss(fusion_setup):
    model, variables, rig, voxel_feats, rulebooks = fusion_setup
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(size=(2, 2, 32, 64, 3)), jnp.float32)
    gt = jnp.asarray(rng.integers(0, 2, (2, 20, 20, 3)), jnp.int32)
    (loss, logs), _ = model.apply(
        variables, img, *rig, voxel_feats, rulebooks, gt, train=True,
        rngs={"diffusion": jax.random.PRNGKey(4), "dropout": jax.random.PRNGKey(5)},
        mutable=["batch_stats"])
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_fusion_sample(fusion_setup):
    model, variables, rig, voxel_feats, rulebooks = fusion_setup
    img = jnp.asarray(np.random.default_rng(6).normal(size=(2, 2, 32, 64, 3)),
                      jnp.float32)
    out = model.apply(variables, img, *rig, voxel_feats, rulebooks,
                      method=model.sample,
                      rngs={"diffusion": jax.random.PRNGKey(7)})
    assert out.shape == (2, 20, 20, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_lidar_grads_flow(fusion_setup):
    """Gradients must reach the sparse conv kernels through the fused path."""
    model, variables, rig, voxel_feats, rulebooks = fusion_setup
    img = jnp.asarray(np.random.default_rng(8).normal(size=(2, 2, 32, 64, 3)),
                      jnp.float32)
    gt = jnp.asarray(np.random.default_rng(9).integers(0, 2, (2, 20, 20, 3)),
                     jnp.int32)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        (l, _), _ = model.apply({"params": p, **rest}, img, *rig, voxel_feats,
                                rulebooks, gt, train=True,
                                rngs={"diffusion": jax.random.PRNGKey(10),
                                      "dropout": jax.random.PRNGKey(11)},
                                mutable=["batch_stats"])
        return l

    grads = jax.grad(loss_fn)(params)
    g = grads["lidar_conv_input"]["kernel"]
    assert float(jnp.abs(g).max()) > 0
