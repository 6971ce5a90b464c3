"""BEV (bird's-eye-view) modules: LSS view transform, camera FPN, BEV decoder.

Parity targets (bev/mmdet3d/models/, studied not copied):
  - LSSTransform (vtransforms/lss.py:14-78 + vtransforms/base.py:53-163):
    depthnet 1x1 conv → softmax depth ⊗ features outer product; frustum
    unprojection cam→lidar; bev_pool scatter; 3-conv stride-2 downsample.
  - GeneralizedLSSFPN (necks/generalized_lss.py): top-down concat-then-conv
    FPN with BN+ReLU, bilinear align_corners=False upsample (per DDP config).
  - GeneralizedResNet (backbones/resnet.py): BasicBlock stages over the BEV.
  - LSSFPN (necks/lss.py): two-level fuse + 2x upsample (align_corners=True).
  - BEVGridTransform (heads/segm/deformable_head_with_time.py:57-97):
    axis-aligned grid_sample between metric scopes — implemented as separable
    1-D bilinear gathers (exactly equivalent for axis-aligned grids, and
    TPU-friendly: two small dense gathers instead of a 2-D gather).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.bev_pool import bev_pool, quantize_geometry
from ..ops.resize import resize
from .common import BatchNorm, ConvModule


def frustum_grid(image_size, feature_size, dbound) -> np.ndarray:
    """[D, fH, fW, 3] (x_px, y_px, depth) frustum (vtransforms/base.py:53-76)."""
    ih, iw = image_size
    fh, fw = feature_size
    ds = np.arange(dbound[0], dbound[1], dbound[2], dtype=np.float32)
    d = len(ds)
    xs = np.linspace(0, iw - 1, fw, dtype=np.float32)
    ys = np.linspace(0, ih - 1, fh, dtype=np.float32)
    f = np.zeros((d, fh, fw, 3), np.float32)
    f[..., 0] = xs[None, None, :]
    f[..., 1] = ys[None, :, None]
    f[..., 2] = ds[:, None, None]
    return f


def lss_geometry(
    frustum: jnp.ndarray,  # [D, fH, fW, 3]
    camera2lidar_rots: jnp.ndarray,  # [B, N, 3, 3]
    camera2lidar_trans: jnp.ndarray,  # [B, N, 3]
    intrins: jnp.ndarray,  # [B, N, 3, 3]
    post_rots: jnp.ndarray,  # [B, N, 3, 3]
    post_trans: jnp.ndarray,  # [B, N, 3]
) -> jnp.ndarray:
    """Unproject the image frustum into the lidar frame
    (vtransforms/base.py:79-122). Returns [B, N, D, fH, fW, 3]."""
    # camera geometry stays f32 regardless of the activation policy: the 3x3
    # inversions are precision-critical and bf16 linalg has no CPU lowering
    dtype = frustum.dtype
    f32 = lambda x: x.astype(jnp.float32)
    pts = f32(frustum)[None, None] - f32(post_trans)[:, :, None, None, None, :]
    inv_post = jnp.linalg.inv(f32(post_rots))
    pts = jnp.einsum("bnij,bndhwj->bndhwi", inv_post, pts)
    # (u·d, v·d, d) before unprojection through the intrinsics
    pts = jnp.concatenate([pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], axis=-1)
    combine = jnp.einsum("bnij,bnjk->bnik", f32(camera2lidar_rots),
                         jnp.linalg.inv(f32(intrins)))
    pts = jnp.einsum("bnij,bndhwj->bndhwi", combine, pts)
    out = pts + f32(camera2lidar_trans)[:, :, None, None, None, :]
    return out.astype(dtype)


class LSSTransform(nn.Module):
    """Lift-Splat-Shoot camera→BEV view transform."""

    out_channels: int = 80
    image_size: Tuple[int, int] = (256, 704)
    feature_size: Tuple[int, int] = (32, 88)
    xbound: Tuple[float, float, float] = (-51.2, 51.2, 0.4)
    ybound: Tuple[float, float, float] = (-51.2, 51.2, 0.4)
    zbound: Tuple[float, float, float] = (-10.0, 10.0, 20.0)
    dbound: Tuple[float, float, float] = (1.0, 60.0, 0.5)
    downsample: int = 2
    # static depth-bin pruning (bev_pool_notes.md lever #1): keep only the
    # top-k depth bins per pixel (renormalized), shrinking both the
    # depth⊗feature outer product and the pool row count by D/k. 0 = off
    # (reference behavior: all D bins, bev_pool filters only out-of-range).
    depth_topk: int = 0

    @property
    def depth_bins(self) -> int:
        return int(round((self.dbound[1] - self.dbound[0]) / self.dbound[2]))

    @property
    def grid(self):
        nx = [int(round((b[1] - b[0]) / b[2]))
              for b in (self.xbound, self.ybound, self.zbound)]
        dx = [b[2] for b in (self.xbound, self.ybound, self.zbound)]
        bx = [b[0] + b[2] / 2.0 for b in (self.xbound, self.ybound, self.zbound)]
        return nx, dx, bx

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,  # [B, N, fH, fW, C] camera features
        camera2lidar_rots, camera2lidar_trans, intrins, post_rots, post_trans,
        train: bool = True,
    ) -> jnp.ndarray:
        b, n, fh, fw, c = feats.shape
        d = self.depth_bins
        ch = self.out_channels

        x = nn.Conv(d + ch, (1, 1), name="depthnet")(feats)
        depth = jax.nn.softmax(x[..., :d], axis=-1)  # [B, N, fH, fW, D]

        frustum = jnp.asarray(frustum_grid(self.image_size, self.feature_size,
                                           self.dbound))
        geom = lss_geometry(frustum, camera2lidar_rots, camera2lidar_trans,
                            intrins, post_rots, post_trans)  # [B,N,D,fH,fW,3]

        k = self.depth_topk
        if k and k < d:
            # prune to the k most likely depth bins per pixel (static
            # capacity): the softmax concentrates mass in a few bins, so the
            # dropped rows carry near-zero features anyway. Renormalize so
            # pooled feature magnitude is preserved.
            topv, topi = jax.lax.top_k(depth, k)  # [B, N, fH, fW, k]
            topv = topv / jnp.maximum(topv.sum(axis=-1, keepdims=True), 1e-6)
            cam = topv[..., None] * x[..., d:][..., None, :]
            cam = jnp.moveaxis(cam, -2, 2)  # [B, N, k, fH, fW, C]
            idx = jnp.moveaxis(topi, -1, 2)[..., None]  # [B,N,k,fH,fW,1]
            geom = jnp.take_along_axis(geom, idx, axis=2)
            d_eff = k
        else:
            # outer product: [B, N, fH, fW, D, C] -> [B, N, D, fH, fW, C]
            cam = depth[..., None] * x[..., d:][..., None, :]
            cam = jnp.moveaxis(cam, -2, 2)
            d_eff = d

        nx, dx, bx = self.grid
        coords, valid = quantize_geometry(geom, tuple(bx), tuple(dx), tuple(nx))
        p = n * d_eff * fh * fw
        pooled = bev_pool(
            cam.reshape(b, p, ch), coords.reshape(b, p, 3), valid.reshape(b, p),
            nx[0], nx[1], nx[2],
        )  # [B, nx, ny, nz*C]

        if self.downsample > 1:
            assert self.downsample == 2
            for i, stride in enumerate((1, 2, 1)):
                pooled = nn.Conv(ch, (3, 3), strides=(stride, stride),
                                 padding="SAME", use_bias=False,
                                 name=f"down{i}")(pooled)
                pooled = BatchNorm(use_running_average=not train,
                                   name=f"down_bn{i}")(pooled)
                pooled = nn.relu(pooled)
        return pooled


class GeneralizedLSSFPN(nn.Module):
    """Concat-then-conv top-down FPN (camera neck)."""

    out_channels: int = 256
    align_corners: bool = False

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = True):
        laterals = list(inputs)
        n = len(laterals) - 1
        outs = [None] * n
        for i in range(n - 1, -1, -1):
            h, w = laterals[i].shape[1:3]
            up = resize(laterals[i + 1], (h, w), mode="bilinear",
                        align_corners=self.align_corners)
            cat = jnp.concatenate([laterals[i], up], axis=-1)
            y = ConvModule(self.out_channels, (1, 1), norm="BN", act="relu",
                           name=f"lateral{i}")(cat, train=train)
            y = ConvModule(self.out_channels, (3, 3), norm="BN", act="relu",
                           name=f"fpn{i}")(y, train=train)
            laterals[i] = y
            outs[i] = y
        return tuple(outs)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False, name="conv1")(x)
        y = BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    name="conv2")(y)
        y = BatchNorm(use_running_average=not train, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="down_conv")(x)
            identity = BatchNorm(use_running_average=not train,
                                 name="down_bn")(identity)
        return nn.relu(y + identity)


class GeneralizedResNet(nn.Module):
    """BasicBlock stages over the BEV grid; returns every stage output."""

    blocks: Tuple[Tuple[int, int, int], ...] = ((2, 160, 2), (2, 320, 2), (2, 640, 1))

    @nn.compact
    def __call__(self, x, train: bool = True) -> List[jnp.ndarray]:
        outs = []
        for si, (num, ch, stride) in enumerate(self.blocks):
            for bi in range(num):
                x = BasicBlock(ch, stride if bi == 0 else 1,
                               name=f"stage{si}_block{bi}")(x, train=train)
            outs.append(x)
        return outs


class LSSFPN(nn.Module):
    """Fuse two BEV decoder levels + optional 2x upsample."""

    in_indices: Tuple[int, int] = (-1, 0)
    out_channels: int = 256
    scale_factor: int = 2

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = True) -> jnp.ndarray:
        x1 = xs[self.in_indices[0]]
        x2 = xs[self.in_indices[1]]
        h, w = x2.shape[1:3]
        x1 = resize(x1, (h, w), mode="bilinear", align_corners=True)
        x = jnp.concatenate([x1, x2], axis=-1)
        x = ConvModule(self.out_channels, (1, 1), norm="BN", act="relu",
                       name="fuse1")(x, train=train)
        x = ConvModule(self.out_channels, (3, 3), norm="BN", act="relu",
                       name="fuse2")(x, train=train)
        if self.scale_factor > 1:
            x = resize(x, (h * self.scale_factor, w * self.scale_factor),
                       mode="bilinear", align_corners=True)
            x = ConvModule(self.out_channels, (3, 3), norm="BN", act="relu",
                           name="up")(x, train=train)
        return x


def bev_grid_transform(
    x: jnp.ndarray,  # [B, H, W, C]
    input_scope: Sequence[Tuple[float, float, float]],
    output_scope: Sequence[Tuple[float, float, float]],
) -> jnp.ndarray:
    """Resample between metric BEV scopes. The sampling grid is axis-aligned,
    so torch's grid_sample(align_corners=False) factorizes into two 1-D
    bilinear interpolations with zero padding outside the input scope."""

    def axis_weights(iscope, oscope, size_in):
        omin, omax, ostep = oscope
        imin, imax, _ = iscope
        v = np.arange(omin + ostep / 2.0, omax, ostep, dtype=np.float64)
        g = (v - imin) / (imax - imin) * 2.0 - 1.0  # normalized [-1, 1]
        src = ((g + 1.0) * size_in - 1.0) / 2.0  # align_corners=False
        lo = np.floor(src).astype(np.int64)
        t = (src - lo).astype(np.float32)
        lo_ok = (lo >= 0) & (lo < size_in)
        hi_ok = (lo + 1 >= 0) & (lo + 1 < size_in)
        lo_c = np.clip(lo, 0, size_in - 1)
        hi_c = np.clip(lo + 1, 0, size_in - 1)
        return (jnp.asarray(lo_c), jnp.asarray(hi_c), jnp.asarray(t),
                jnp.asarray(lo_ok.astype(np.float32)),
                jnp.asarray(hi_ok.astype(np.float32)))

    h, w = x.shape[1:3]
    # rows correspond to scope[0] (u ~ first axis), cols to scope[1]
    rlo, rhi, rt, rlo_ok, rhi_ok = axis_weights(input_scope[0], output_scope[0], h)
    clo, chi, ct, clo_ok, chi_ok = axis_weights(input_scope[1], output_scope[1], w)

    top = jnp.take(x, rlo, axis=1) * rlo_ok[None, :, None, None]
    bot = jnp.take(x, rhi, axis=1) * rhi_ok[None, :, None, None]
    x = top * (1.0 - rt)[None, :, None, None] + bot * rt[None, :, None, None]
    left = jnp.take(x, clo, axis=2) * clo_ok[None, None, :, None]
    right = jnp.take(x, chi, axis=2) * chi_ok[None, None, :, None]
    return left * (1.0 - ct)[None, None, :, None] + right * ct[None, None, :, None]


class DepthLSSTransform(nn.Module):
    """Lidar-guided LSS (the fusion model's vtransform).

    Parity target: DepthLSSTransform (bev/mmdet3d/models/vtransforms/
    depth_lss.py:15-124): a sparse per-pixel lidar depth canvas at image
    resolution is encoded by ``dtransform`` (1→8 1x1, 8→32 5x5/4, 32→64
    5x5/2 — net /8 to feature scale), concatenated with camera features, and
    fed to a 2-conv depthnet producing D+C channels.

    The depth canvas is rasterized on HOST (numpy, see
    data/bev_datasets.rasterize_lidar_depth) — projecting sparse points is a
    data-layout job, not an MXU job (TPU-first split, SURVEY.md §7).
    """

    out_channels: int = 80
    image_size: Tuple[int, int] = (256, 704)
    feature_size: Tuple[int, int] = (32, 88)
    xbound: Tuple[float, float, float] = (-51.2, 51.2, 0.4)
    ybound: Tuple[float, float, float] = (-51.2, 51.2, 0.4)
    zbound: Tuple[float, float, float] = (-10.0, 10.0, 20.0)
    dbound: Tuple[float, float, float] = (1.0, 60.0, 0.5)
    downsample: int = 2

    @property
    def depth_bins(self) -> int:
        return int(round((self.dbound[1] - self.dbound[0]) / self.dbound[2]))

    @property
    def grid(self):
        nx = [int(round((b[1] - b[0]) / b[2]))
              for b in (self.xbound, self.ybound, self.zbound)]
        dx = [b[2] for b in (self.xbound, self.ybound, self.zbound)]
        bx = [b[0] + b[2] / 2.0 for b in (self.xbound, self.ybound, self.zbound)]
        return nx, dx, bx

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,  # [B, N, fH, fW, C]
        depth_canvas: jnp.ndarray,  # [B, N, H, W, 1] sparse lidar depth
        camera2lidar_rots, camera2lidar_trans, intrins, post_rots, post_trans,
        train: bool = True,
    ) -> jnp.ndarray:
        b, n, fh, fw, c = feats.shape
        d_bins = self.depth_bins
        ch = self.out_channels

        dc = depth_canvas.reshape((b * n,) + depth_canvas.shape[2:])
        dspec = [(8, (1, 1), 1), (32, (5, 5), 4), (64, (5, 5), 2)]
        for i, (f, k, s) in enumerate(dspec):
            dc = nn.Conv(f, k, strides=(s, s), padding="SAME",
                         name=f"dtransform{i}")(dc)
            dc = BatchNorm(use_running_average=not train,
                           name=f"dtransform_bn{i}")(dc)
            dc = nn.relu(dc)
        dc = dc.reshape(b, n, fh, fw, -1)

        x = jnp.concatenate([dc, feats], axis=-1)
        for i in range(2):
            x = nn.Conv(c, (3, 3), padding="SAME", name=f"depthnet{i}")(x)
            x = BatchNorm(use_running_average=not train,
                          name=f"depthnet_bn{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(d_bins + ch, (1, 1), name="depthnet_out")(x)

        depth = jax.nn.softmax(x[..., :d_bins], axis=-1)
        cam = depth[..., None] * x[..., d_bins:][..., None, :]
        cam = jnp.moveaxis(cam, -2, 2)  # [B, N, D, fH, fW, C]

        frustum = jnp.asarray(frustum_grid(self.image_size, self.feature_size,
                                           self.dbound))
        geom = lss_geometry(frustum, camera2lidar_rots, camera2lidar_trans,
                            intrins, post_rots, post_trans)
        nx, dx, bx = self.grid
        coords, valid = quantize_geometry(geom, tuple(bx), tuple(dx), tuple(nx))
        p = n * d_bins * fh * fw
        pooled = bev_pool(cam.reshape(b, p, ch), coords.reshape(b, p, 3),
                          valid.reshape(b, p), nx[0], nx[1], nx[2])
        if self.downsample > 1:
            assert self.downsample == 2
            for i, stride in enumerate((1, 2, 1)):
                pooled = nn.Conv(ch, (3, 3), strides=(stride, stride),
                                 padding="SAME", use_bias=False,
                                 name=f"down{i}")(pooled)
                pooled = BatchNorm(use_running_average=not train,
                                   name=f"down_bn{i}")(pooled)
                pooled = nn.relu(pooled)
        return pooled
