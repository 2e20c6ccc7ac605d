"""Model construction from configs (reference: models/builder.py:79-158).

A decorator-based head registry plus ``build_model`` /
``build_model_from_config`` that assemble backbone + neck + heads into an
``EncoderDecoder`` (or ``DatClassifier`` for ClsHead configs).
"""

from __future__ import annotations

from typing import Callable, Dict

from flax import linen as nn

from ..configs.schema import BackboneConfig, HeadConfig, ModelConfig
from .dat import DAT
from .heads import ClsHead, FCNHead, FPNHead, FPNNeck, UPerHead
from .segmentor import DatClassifier, EncoderDecoder

_HEAD_REGISTRY: Dict[str, Callable] = {}


def register_head(name: str):
    """Decorator-based registry (reference: models/builder.py:42-66)."""

    def deco(fn):
        _HEAD_REGISTRY[name] = fn
        return fn

    return deco


@register_head("UPerHead")
def _build_uper(cfg: HeadConfig, name: str) -> nn.Module:
    return UPerHead(
        num_classes=cfg.num_classes,
        channels=cfg.channels,
        pool_scales=tuple(cfg.kwargs.get("pool_scales", (1, 2, 3, 6))),
        dropout_ratio=cfg.kwargs.get("dropout_ratio", 0.1),
        topdown=cfg.kwargs.get("topdown", "mmseg"),
        name=name,
    )


@register_head("FCNHead")
def _build_fcn(cfg: HeadConfig, name: str) -> nn.Module:
    return FCNHead(
        num_classes=cfg.num_classes,
        channels=cfg.channels,
        num_convs=cfg.kwargs.get("num_convs", 1),
        dropout_ratio=cfg.kwargs.get("dropout_ratio", 0.1),
        name=name,
    )


@register_head("FPNHead")
def _build_fpnhead(cfg: HeadConfig, name: str) -> nn.Module:
    return FPNHead(
        num_classes=cfg.num_classes,
        channels=cfg.channels,
        feature_strides=tuple(cfg.kwargs.get("feature_strides", (4, 8, 16, 32))),
        dropout_ratio=cfg.kwargs.get("dropout_ratio", 0.1),
        name=name,
    )


@register_head("ClsHead")
def _build_cls(cfg: HeadConfig, name: str) -> nn.Module:
    return ClsHead(
        num_classes=cfg.num_classes,
        dropout_ratio=cfg.kwargs.get("dropout_ratio", 0.0),
        name=name,
    )


def build_backbone(cfg: BackboneConfig, name: str = "backbone") -> DAT:
    fields = {
        f: getattr(cfg, f)
        for f in BackboneConfig.__dataclass_fields__
        if f in DAT.__dataclass_fields__
    }
    return DAT(**fields, name=name)


def build_model(cfg: ModelConfig) -> nn.Module:
    """ModelConfig -> flax module (EncoderDecoder or DatClassifier)."""
    backbone = build_backbone(cfg.backbone)
    if cfg.decode_head.type == "ClsHead":
        return DatClassifier(
            backbone=backbone,
            num_classes=cfg.decode_head.num_classes,
            dropout_ratio=cfg.decode_head.kwargs.get("dropout_ratio", 0.0),
        )
    decode = _HEAD_REGISTRY[cfg.decode_head.type](cfg.decode_head, "decode_head")
    aux = None
    if cfg.auxiliary_head is not None:
        aux = _HEAD_REGISTRY[cfg.auxiliary_head.type](
            cfg.auxiliary_head, "auxiliary_head"
        )
    neck = None
    if cfg.neck is not None:
        neck = FPNNeck(out_channels=cfg.neck.out_channels, name="neck")
    return EncoderDecoder(
        backbone=backbone,
        decode_head=decode,
        auxiliary_head=aux,
        neck=neck,
        align_corners=cfg.align_corners,
        aux_in_index=cfg.aux_in_index,
    )


def build_model_from_config(name_or_cfg) -> nn.Module:
    """Build from a preset name, TrainConfig, or ModelConfig
    (reference: models/builder.py:79-158)."""
    from ..configs.presets import get_config

    cfg = name_or_cfg
    if isinstance(cfg, str):
        cfg = get_config(cfg)
    if hasattr(cfg, "model"):
        cfg = cfg.model
    return build_model(cfg)


if __name__ == "__main__":
    # builder CLI smoke test (reference: models/builder.py:169-176)
    import sys

    name = sys.argv[1] if len(sys.argv) > 1 else "upn_tiny_160k_dp03_lr6"
    model = build_model_from_config(name)
    print(model)
