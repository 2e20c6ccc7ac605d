"""Ingest mmseg-style config dicts (reference configs/) into our schema.

The reference's model builder silently drops mmseg-only kwargs via
``inspect.signature`` filtering (reference: models/builder.py:125-150); we
do the same but explicitly, by mapping known keys. Lets the exact
``configs/dat/*.py`` model dicts (loaded as plain python modules) build
the TPU models for parity runs.
"""

from __future__ import annotations

import importlib.util
from typing import Any, Dict, Optional

from .schema import BackboneConfig, HeadConfig, ModelConfig, NeckConfig

_BACKBONE_KEYS = set(BackboneConfig.__dataclass_fields__)

_SEQ_FIELDS = {
    f for f, spec in BackboneConfig.__dataclass_fields__.items()
    if "Tuple" in str(spec.type)
}


def _tuplify(v):
    if isinstance(v, list):
        return tuple(_tuplify(e) for e in v)
    return v


def backbone_config_from_mmseg(d: Dict[str, Any]) -> BackboneConfig:
    kwargs = {}
    for k, v in d.items():
        if k in _BACKBONE_KEYS:
            kwargs[k] = _tuplify(v) if k in _SEQ_FIELDS else v
        # mmseg-only keys (type, init_cfg, heads_q, sr_ratios, ...) dropped,
        # mirroring builder.py's signature filtering.
    return BackboneConfig(**kwargs)


def _head_from_mmseg(
    d: Optional[Dict[str, Any]],
    default_type: str = "UPerHead",
    default_channels: int = 512,
) -> Optional[HeadConfig]:
    if d is None:
        return None
    htype = d.get("type", default_type)
    kwargs = {}
    if htype == "UPerHead":
        kwargs["pool_scales"] = _tuplify(d.get("pool_scales", (1, 2, 3, 6)))
        kwargs["dropout_ratio"] = d.get("dropout_ratio", 0.1)
    elif htype == "FCNHead":
        kwargs["num_convs"] = d.get("num_convs", 1)
        kwargs["dropout_ratio"] = d.get("dropout_ratio", 0.1)
    elif htype == "FPNHead":
        kwargs["feature_strides"] = _tuplify(
            d.get("feature_strides", (4, 8, 16, 32))
        )
        kwargs["dropout_ratio"] = d.get("dropout_ratio", 0.1)
    return HeadConfig(
        type=htype,
        num_classes=d.get("num_classes", 150),
        channels=d.get("channels", default_channels),
        kwargs=kwargs,
    )


def model_config_from_mmseg(model: Dict[str, Any]) -> ModelConfig:
    """Build a ModelConfig from an mmseg ``model = dict(...)`` dict."""
    backbone = backbone_config_from_mmseg(model["backbone"])
    # role defaults match the reference _base_ files
    # (configs/_base_/models/upernet_dat.py:42-66)
    decode = _head_from_mmseg(model.get("decode_head"), "UPerHead", 512)
    aux = _head_from_mmseg(model.get("auxiliary_head"), "FCNHead", 256)
    neck = None
    if model.get("neck") is not None:
        neck = NeckConfig("FPN", model["neck"].get("out_channels", 256))
    aux_in_index = (
        model.get("auxiliary_head", {}) or {}
    ).get("in_index", 2)
    aux_w = 0.4
    if model.get("auxiliary_head"):
        aux_w = (
            model["auxiliary_head"].get("loss_decode", {}) or {}
        ).get("loss_weight", 0.4)
    test_cfg = model.get("test_cfg", {}) or {}
    return ModelConfig(
        backbone=backbone,
        decode_head=decode,
        auxiliary_head=aux,
        neck=neck,
        aux_in_index=aux_in_index,
        aux_loss_weight=aux_w,
        num_classes=decode.num_classes,
        test_mode=test_cfg.get("mode", "whole"),
    )


def load_python_config(path: str) -> Dict[str, Any]:
    """Load a plain-python config module (no _base_ resolution) and return
    its ``model`` dict — the reference's importlib loader semantics
    (models/builder.py:14-21)."""
    spec = importlib.util.spec_from_file_location("_user_config", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.model
