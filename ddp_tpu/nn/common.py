"""Common NN building blocks (flax.linen, NHWC layout).

TPU-native equivalents of the mmcv bricks the reference composes everywhere:
ConvModule (conv→norm→act, mmcv.cnn.ConvModule), GroupNorm/LayerNorm/BatchNorm
wrappers, DropPath (stochastic depth), and init helpers.

Norm note: the reference's 'SyncBN' (configs/ade/ddp_swin_t...py:9) is a
cross-GPU batchnorm. Under pjit with a batch-sharded mesh, a plain jnp mean
over the batch axis IS the global mean — XLA inserts the collective — so
``BatchNorm`` here is automatically "sync" when the train step is sharded.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class DropPath(nn.Module):
    """Stochastic depth: drop the residual branch per sample."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: Optional[bool] = None) -> jnp.ndarray:
        deterministic = nn.merge_param("deterministic", self.deterministic, deterministic)
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class GroupNorm32(nn.Module):
    """GroupNorm with 32 groups — the reference's neck norm
    (configs/ade/ddp_swin_t...py:44,51)."""

    num_groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5)(x)


class BatchNorm(nn.Module):
    """BatchNorm2d over NHWC. Global (sync) when batch is mesh-sharded."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=None,
        )(x)


def make_norm(norm: Optional[str], train: bool = True) -> Optional[Callable]:
    """Norm factory: 'GN' (32 groups), 'LN', 'BN'/'SyncBN', or None."""
    if norm is None:
        return None
    if norm == "GN":
        return GroupNorm32()
    if norm == "LN":
        return nn.LayerNorm(epsilon=1e-5)
    if norm in ("BN", "SyncBN"):
        return BatchNorm(use_running_average=not train)
    raise ValueError(f"unknown norm {norm!r}")


_ACTS = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "silu": nn.silu,
    None: None,
}


class ConvModule(nn.Module):
    """conv → norm → act, mirroring mmcv.cnn.ConvModule defaults
    (bias auto-disabled when a norm follows)."""

    features: int
    kernel_size: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    norm: Optional[str] = None
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        use_bias = self.norm is None
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=use_bias,
        )(x)
        norm = make_norm(self.norm, train)
        if norm is not None:
            x = norm(x)
        act = _ACTS[self.act]
        if act is not None:
            x = act(x)
        return x


class Mlp(nn.Module):
    """Linear → act → Linear (transformer FFN core / time MLPs)."""

    hidden: int
    out: int
    act: Callable = nn.gelu
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.hidden)(x)
        x = self.act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x
