"""Shape-contract tests for the compat backbones (ResNet/ViT/MiT/DiffSwin) —
mirrors the reference's tests/test_models/test_backbones style (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from ddp_tpu.nn.diffswin import DiffSwinTransformer
from ddp_tpu.nn.mit import MixVisionTransformer, mit_variant
from ddp_tpu.nn.resnet import ResNet, resnext
from ddp_tpu.nn.vit import VisionTransformer, vit_variant


def test_resnet_basic_shapes():
    m = ResNet(depth=18)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    outs = m.apply(v, x, train=False)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512)]


def test_resnet_bottleneck_dilated_os8():
    # mmseg output-stride-8 config: strides (1,2,1,1), dilations (1,1,2,4)
    m = ResNet(depth=50, strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4))
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    outs = m.apply(v, x, train=False)
    assert outs[0].shape == (1, 16, 16, 256)
    assert outs[2].shape == (1, 8, 8, 1024)  # dilation keeps resolution
    assert outs[3].shape == (1, 8, 8, 2048)


def test_resnext_groups():
    m = resnext(depth=50, groups=4, width_per_group=16)
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    outs = m.apply(v, x, train=False)
    assert outs[-1].shape[-1] == 2048


def test_vit_grid_outputs_and_pos_resize():
    m = VisionTransformer(**vit_variant("nano"), patch_size=8)
    x = jnp.zeros((2, 48, 48, 3))  # grid 6x6 != pretrain 14 -> resized pos
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    outs = m.apply(v, x, train=False)
    assert all(o.shape == (2, 6, 6, 32) for o in outs)


def test_mit_hierarchical_shapes():
    m = MixVisionTransformer(**mit_variant("nano"))
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    outs = m.apply(v, x, train=False)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 16), (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128)]


def test_diffswin_time_conditioning_changes_output():
    m = DiffSwinTransformer(embed_dims=16, depths=(1, 1, 1, 1),
                            num_heads=(1, 2, 2, 2), window=4, time_dim=64)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, jnp.zeros((1,)), train=False)
    o0 = m.apply(v, x, jnp.zeros((1,)), train=False)
    o1 = m.apply(v, x, jnp.ones((1,)), train=False)
    assert o0[0].shape == (1, 8, 8, 16)
    # FiLM must actually modulate features with time
    assert float(jnp.abs(o0[-1] - o1[-1]).max()) > 1e-6
