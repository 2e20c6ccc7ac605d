"""EncoderDecoder segmentor and DAT classifier (NHWC).

Reference: models/segmentor.py:10-60 (EncoderDecoder) and
models/dat_classifier.py:13-28 (DatClassifier). The segmentor wires
backbone -> neck (optional, for SemanticFPN) -> decode head, bilinearly
upsamples logits to the input size, and during training also returns the
auxiliary-head logits computed on the stage-2 feature (in_index=2).
"""

from __future__ import annotations

import contextlib
from typing import Optional, Tuple, Union

import jax
from flax import linen as nn

from ..ops import valid_extent as _ve
from ..ops.interpolate import resize_bilinear
from .heads import ClsHead


class EncoderDecoder(nn.Module):
    """backbone + optional neck + decode head (+ aux head in training)."""

    backbone: nn.Module
    decode_head: nn.Module
    auxiliary_head: Optional[nn.Module] = None
    neck: Optional[nn.Module] = None
    align_corners: bool = False
    aux_in_index: int = 2

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        deterministic: bool = True,
        with_aux: Optional[bool] = None,
        upsample: bool = True,
        valid_hw: Optional[jax.Array] = None,
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        """``upsample=False`` returns stride-4 logits (the head's native
        resolution); eval transfers those and upsamples on the host — the
        bilinear upsample is linear, so resize-then-slice equals
        slice-then-resize and host f32 matches mmseg's resize exactly.

        ``valid_hw`` ((B, 2) int32 per-sample true image sizes) enables
        EXACT padded inference (ops/valid_extent.py): the forward on the
        zero-padded batch equals the exact-shape forward on each sample's
        valid region — mmseg whole-mode semantics under static shapes.
        Callers slice the stride-4 logits to each sample's true extent
        before the host upsample, so ``upsample`` must be False.
        """
        if valid_hw is not None and upsample:
            raise ValueError(
                "exact padded inference returns stride-4 logits; host code "
                "slices to the true extent and upsamples (use upsample=False)"
            )
        if with_aux is None:
            with_aux = train and self.auxiliary_head is not None
        cm = (
            _ve.exact_extent(x.shape[1:3], valid_hw)
            if valid_hw is not None
            else contextlib.nullcontext()
        )
        with cm:
            return self._forward(
                x,
                train=train,
                deterministic=deterministic,
                with_aux=with_aux,
                upsample=upsample,
            )

    def _forward(self, x, *, train, deterministic, with_aux, upsample):
        feats = self.backbone(x, deterministic=deterministic, train=train)
        aux_feat = feats[self.aux_in_index]
        head_feats = self.neck(feats) if self.neck is not None else feats
        logits = self.decode_head(
            head_feats, train=train, deterministic=deterministic
        )
        if upsample:
            logits = resize_bilinear(
                logits, x.shape[1:3], align_corners=self.align_corners
            )
        # trace the aux head during init even in eval mode so its params
        # (and batch stats) always exist in the variable tree
        if self.auxiliary_head is not None and (with_aux or self.is_initializing()):
            aux = self.auxiliary_head(
                aux_feat, train=train, deterministic=deterministic
            )
            aux = resize_bilinear(
                aux, x.shape[1:3], align_corners=self.align_corners
            )
            if with_aux:
                return logits, aux
        return logits


class DatClassifier(nn.Module):
    """DAT backbone + ClsHead (reference: models/dat_classifier.py)."""

    backbone: nn.Module
    num_classes: int = 1000
    dropout_ratio: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        deterministic: bool = True,
    ) -> jax.Array:
        feats = self.backbone(x, deterministic=deterministic, train=train)
        return ClsHead(
            self.num_classes, self.dropout_ratio, name="head"
        )(feats, deterministic=deterministic)
