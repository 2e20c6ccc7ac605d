"""Decode heads: UPerHead, FCNHead, FPN neck + FPNHead, ClsHead (NHWC).

Covers both head families the reference publishes numbers for
(reference: models/heads/uper_head.py, models/heads/fcn_head.py,
models/heads/cls_head.py for the in-repo standalone stack; FPN/FPNHead
live in mmseg and are reconstructed from configs/_base_/models/fpn_dat.py:41-57).

BatchNorm under a pjit-sharded batch axis is globally reduced by GSPMD,
which reproduces the mmseg SyncBN configuration without NCCL.
"""

from __future__ import annotations

import contextlib
import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import valid_extent as _ve
from ..ops.interpolate import adaptive_avg_pool, resize_bilinear, resize_nearest
from .layers import batch_norm, LayerNorm2d, conv2d, dense


def _resize(x, out_hw, src_ext, dst_ext, align_corners):
    """Static bilinear resize, or the traced-extent form under exact
    padded inference (ops/valid_extent.py) when extents are known."""
    if src_ext is not None and dst_ext is not None:
        return _ve.resize_bilinear_extent(
            x, out_hw, src_ext, dst_ext, align_corners=align_corners
        )
    return resize_bilinear(x, out_hw, align_corners=align_corners)


class ConvBNReLU(nn.Module):
    """conv(bias=False) + BN + ReLU, the mmseg ConvModule default."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = conv2d(
            x, self.features, self.kernel, padding=self.kernel // 2,
            use_bias=False, name="conv",
        )
        x = batch_norm(x, use_running_average=not train, name="bn")
        return nn.relu(x)


class UPerHead(nn.Module):
    """UperNet decode head: PPM + top-down FPN + fuse
    (reference: models/heads/uper_head.py:8-131).

    ``topdown`` selects between the two published behaviors:
    * 'mmseg'      — add all top-down contributions on raw laterals, then
                     refine each level (mmseg UPerHead; matches published
                     checkpoints);
    * 'standalone' — refine each level in place inside the top-down loop
                     (the reference fork's own re-implementation,
                     uper_head.py:111-117).
    Both share identical parameters.
    """

    num_classes: int
    channels: int = 512
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dropout_ratio: float = 0.1
    align_corners: bool = False
    topdown: str = "mmseg"

    @nn.compact
    def __call__(
        self,
        feats: Sequence[jax.Array],
        *,
        train: bool = False,
        deterministic: bool = True,
    ) -> jax.Array:
        n = len(feats)
        # exact padded inference: per-level true extents (None otherwise)
        ctx = _ve.current()
        exts = [
            ctx.get(f.shape[1:3]) if ctx is not None else None for f in feats
        ]

        # ---- PPM on the deepest feature ---------------------------------
        deep = feats[-1]
        ppm_c = self.channels // len(self.pool_scales)
        ppm_outs = [deep]
        for j, scale in enumerate(self.pool_scales):
            if exts[-1] is not None:
                # pool bins over the TRUE extent; the (scale, scale)
                # output is fully valid, so only the resize back up needs
                # traced ratios
                p = _ve.adaptive_avg_pool_extent(
                    deep, (scale, scale), exts[-1]
                )
                full = jnp.full_like(exts[-1], scale)
                with _ve.suspend():  # pooled map is fully valid
                    p = ConvBNReLU(ppm_c, 1, name=f"ppm_{j}")(p, train)
            else:
                p = adaptive_avg_pool(deep, (scale, scale))
                full = None
                p = ConvBNReLU(ppm_c, 1, name=f"ppm_{j}")(p, train)
            p = _resize(
                p, deep.shape[1:3], full, exts[-1], self.align_corners
            )
            ppm_outs.append(p)
        psp = ConvBNReLU(self.channels, 3, name="ppm_bottleneck")(
            jnp.concatenate(ppm_outs, axis=-1), train
        )

        # ---- laterals ----------------------------------------------------
        laterals = [
            ConvBNReLU(self.channels, 1, name=f"lateral_{i}")(feats[i], train)
            for i in range(n - 1)
        ]
        laterals.append(psp)

        # ---- top-down path ------------------------------------------------
        fpn_convs = [
            ConvBNReLU(self.channels, 3, name=f"fpn_{i}") for i in range(n - 1)
        ]
        if self.topdown == "mmseg":
            for i in range(n - 1, 0, -1):
                up = _resize(
                    laterals[i],
                    laterals[i - 1].shape[1:3],
                    exts[i],
                    exts[i - 1],
                    self.align_corners,
                )
                laterals[i - 1] = laterals[i - 1] + up
            outs = [fpn_convs[i](laterals[i], train) for i in range(n - 1)]
            outs.append(laterals[-1])
        elif self.topdown == "standalone":
            for i in range(n - 1, 0, -1):
                up = _resize(
                    laterals[i],
                    laterals[i - 1].shape[1:3],
                    exts[i],
                    exts[i - 1],
                    self.align_corners,
                )
                laterals[i - 1] = fpn_convs[i - 1](laterals[i - 1] + up, train)
            outs = laterals
        else:
            raise ValueError(self.topdown)

        # ---- fuse ----------------------------------------------------------
        target = outs[0].shape[1:3]
        outs = [outs[0]] + [
            _resize(o, target, exts[i + 1], exts[0], self.align_corners)
            for i, o in enumerate(outs[1:])
        ]
        x = ConvBNReLU(self.channels, 3, name="fuse_bottleneck")(
            jnp.concatenate(outs, axis=-1), train
        )
        x = nn.Dropout(self.dropout_ratio, deterministic=deterministic)(x)
        return dense(x, self.num_classes, name="cls_seg")


class FCNHead(nn.Module):
    """Auxiliary FCN head (reference: models/heads/fcn_head.py:8-46)."""

    num_classes: int
    channels: int = 256
    num_convs: int = 1
    dropout_ratio: float = 0.1

    @nn.compact
    def __call__(
        self, x: jax.Array, *, train: bool = False, deterministic: bool = True
    ) -> jax.Array:
        for i in range(self.num_convs):
            x = ConvBNReLU(self.channels, 3, name=f"conv_{i}")(x, train)
        x = nn.Dropout(self.dropout_ratio, deterministic=deterministic)(x)
        return dense(x, self.num_classes, name="cls_seg")


class FPNNeck(nn.Module):
    """mmseg-style FPN neck (reconstructed from configs/_base_/models/fpn_dat.py:41-46):
    1x1 laterals (bias, no norm), nearest top-down adds, 3x3 output convs."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]) -> List[jax.Array]:
        n = len(feats)
        ctx = _ve.current()
        exts = [
            ctx.get(f.shape[1:3]) if ctx is not None else None for f in feats
        ]
        laterals = [
            dense(feats[i], self.out_channels, name=f"lateral_{i}")
            for i in range(n)
        ]
        for i in range(n - 1, 0, -1):
            if exts[i] is not None:
                up = _ve.resize_nearest_extent(
                    laterals[i],
                    laterals[i - 1].shape[1:3],
                    exts[i],
                    exts[i - 1],
                )
            else:
                up = resize_nearest(laterals[i], laterals[i - 1].shape[1:3])
            laterals[i - 1] = laterals[i - 1] + up
        return [
            conv2d(
                laterals[i], self.out_channels, 3, padding=1, name=f"fpn_{i}"
            )
            for i in range(n)
        ]


class FPNHead(nn.Module):
    """Semantic-FPN decode head (mmseg FPNHead; config at
    configs/_base_/models/fpn_dat.py:47-57): per-level scale heads of
    [3x3 ConvBNReLU + 2x bilinear upsample] chains, summed, then classified."""

    num_classes: int
    feature_strides: Sequence[int] = (4, 8, 16, 32)
    channels: int = 128
    dropout_ratio: float = 0.1
    align_corners: bool = False

    @nn.compact
    def __call__(
        self,
        feats: Sequence[jax.Array],
        *,
        train: bool = False,
        deterministic: bool = True,
    ) -> jax.Array:
        fs = self.feature_strides
        ctx = _ve.current()
        exts = [
            ctx.get(f.shape[1:3]) if ctx is not None else None for f in feats
        ]
        # Exact padded inference tracks extents LOCALLY here: upsampled
        # maps land on padded shapes that collide with registered
        # feature-map keys at DIFFERENT true extents (e.g. a 2x-upsampled
        # stride-32 map has true extent 2*e32, not the stride-16 e16), so
        # the shared context is suspended and inputs masked explicitly.
        exact = ctx is not None and all(e is not None for e in exts)
        outputs = []
        out_exts = []
        with _ve.suspend() if exact else contextlib.nullcontext():
            for i in range(len(fs)):
                x = feats[i]
                e = exts[i]
                if exact:
                    x = _ve.mask_tensor(x, e)
                head_length = max(1, int(math.log2(fs[i]) - math.log2(fs[0])))
                for k in range(head_length):
                    x = ConvBNReLU(self.channels, 3, name=f"scale_{i}_{k}")(
                        x, train
                    )
                    if fs[i] != fs[0]:
                        target = (x.shape[1] * 2, x.shape[2] * 2)
                        if exact:
                            # scale_factor=2 upsample: true dst size is
                            # exactly 2x the true src size
                            x = _ve.resize_bilinear_extent(
                                x, target, e, 2 * e,
                                align_corners=self.align_corners,
                            )
                            e = 2 * e
                        else:
                            x = resize_bilinear(
                                x, target, align_corners=self.align_corners
                            )
                outputs.append(x)
                out_exts.append(e)
            out = outputs[0]
            for i in range(1, len(outputs)):
                if exact:
                    # mmseg resizes every level to outputs[0]'s TRUE shape
                    # (padded sizes already agree, true sizes do not)
                    out = out + _ve.resize_bilinear_extent(
                        outputs[i], out.shape[1:3], out_exts[i], out_exts[0],
                        align_corners=self.align_corners,
                    )
                else:
                    out = out + resize_bilinear(
                        outputs[i], out.shape[1:3],
                        align_corners=self.align_corners,
                    )
        out = nn.Dropout(self.dropout_ratio, deterministic=deterministic)(out)
        return dense(out, self.num_classes, name="cls_seg")


class ClsHead(nn.Module):
    """Classification head (reference: models/heads/cls_head.py:10-38):
    LN on the last feature, global average pool, dropout, linear."""

    num_classes: int
    dropout_ratio: float = 0.0

    @nn.compact
    def __call__(
        self,
        feats: Sequence[jax.Array],
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        x = LayerNorm2d(name="norm")(feats[-1])
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout_ratio, deterministic=deterministic)(x)
        return dense(x, self.num_classes, name="fc")
