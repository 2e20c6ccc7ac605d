"""Named configuration presets for the DAT++ model family.

The reference ships exactly one concrete config
(configs/dat/upn_tiny_160k_dp03_lr6.py) but publishes numbers for six
(fpn/upn x T/S/B; README.md:23-35). The S/B backbone widths follow the
README mIoU table (dims 96->768 / 128->1024) and the DAT++ paper
(arXiv 2309.01430): width-scaled, same depths [2,4,18,2], same
alternating X/D stage specs. The fpn schedule constants come from the
referenced-but-absent ``fpn_tiny_80k_dp04_lr2.py`` name (80k iters,
drop-path 0.4, lr 2e-4 — the mmseg FPN recipes' AdamW lr 2e-4 w/ poly).
"""

from __future__ import annotations

import dataclasses

from .schema import (
    BackboneConfig,
    DataConfig,
    HeadConfig,
    ModelConfig,
    NeckConfig,
    OptimizerConfig,
    ScheduleConfig,
    TrainConfig,
)

# ---------------------------------------------------------------------------
# Backbones (DAT++ = conv patches + LPU + DWC-MLP + continuous RPE + raw
# clamped offsets; configs/dat/upn_tiny_160k_dp03_lr6.py:8-32)
# ---------------------------------------------------------------------------


def _plus_plus_spec(depths):
    spec = []
    for i, d in enumerate(depths):
        if i == 3:
            spec.append(("D",) * d)
        else:
            spec.append(tuple(("X" if j % 2 == 0 else "D") for j in range(d)))
    return tuple(spec)


def _pp_backbone(dim_stem, dims, depths, heads, groups, drop_path) -> BackboneConfig:
    return BackboneConfig(
        img_size=224,
        patch_size=4,
        dim_stem=dim_stem,
        dims=tuple(dims),
        depths=tuple(depths),
        stage_spec=_plus_plus_spec(depths),
        heads=tuple(heads),
        groups=tuple(groups),
        use_pes=(True,) * 4,
        strides=(8, 4, 2, 1),
        offset_range_factor=(-1, -1, -1, -1),
        use_dwc_mlps=(True,) * 4,
        use_lpus=(True,) * 4,
        use_conv_patches=True,
        ksizes=(9, 7, 5, 3),
        window_sizes=(7, 7, 7, 7),
        drop_path_rate=drop_path,
        use_checkpoint=False,
        kernel_impl="auto",
    )


def dat_tiny_pp(drop_path=0.3) -> BackboneConfig:
    return _pp_backbone(64, [64, 128, 256, 512], [2, 4, 18, 2],
                        [2, 4, 8, 16], [1, 2, 4, 8], drop_path)


def dat_small_pp(drop_path=0.4) -> BackboneConfig:
    return _pp_backbone(96, [96, 192, 384, 768], [2, 4, 18, 2],
                        [3, 6, 12, 24], [1, 2, 3, 6], drop_path)


def dat_base_pp(drop_path=0.5) -> BackboneConfig:
    return _pp_backbone(128, [128, 256, 512, 1024], [2, 4, 18, 2],
                        [4, 8, 16, 32], [1, 2, 4, 8], drop_path)


_BACKBONES = {"tiny": dat_tiny_pp, "small": dat_small_pp, "base": dat_base_pp}


# ---------------------------------------------------------------------------
# Full model/train presets
# ---------------------------------------------------------------------------


def _upernet(size: str, drop_path: float) -> TrainConfig:
    bb = _BACKBONES[size](drop_path)
    return TrainConfig(
        name=f"upn_{size}_160k",
        model=ModelConfig(
            backbone=bb,
            decode_head=HeadConfig("UPerHead", 150, 512),
            auxiliary_head=HeadConfig("FCNHead", 150, 256),
            num_classes=150,
        ),
        optimizer=OptimizerConfig(lr=6e-5),
        schedule=ScheduleConfig(policy="poly", max_iters=160_000),
    )


def _fpn(size: str, drop_path: float) -> TrainConfig:
    bb = _BACKBONES[size](drop_path)
    return TrainConfig(
        name=f"fpn_{size}_80k",
        model=ModelConfig(
            backbone=bb,
            neck=NeckConfig("FPN", 256),
            decode_head=HeadConfig(
                "FPNHead", 150, 128,
                kwargs={"feature_strides": (4, 8, 16, 32)},
            ),
            auxiliary_head=None,
            num_classes=150,
        ),
        optimizer=OptimizerConfig(lr=2e-4, weight_decay=1e-4),
        schedule=ScheduleConfig(policy="poly", power=0.9, max_iters=80_000),
    )


def _classifier(size: str) -> TrainConfig:
    bb = dataclasses.replace(_BACKBONES[size](0.2), use_checkpoint=False)
    return TrainConfig(
        name=f"cls_{size}_imagenet",
        model=ModelConfig(
            backbone=bb,
            decode_head=HeadConfig("ClsHead", 1000, 0),
            auxiliary_head=None,
            num_classes=1000,
        ),
        data=DataConfig(dataset="imagenet", crop_size=(224, 224),
                        batch_size=1024),
        optimizer=OptimizerConfig(lr=1e-3, weight_decay=0.05, grad_clip=5.0),
        schedule=ScheduleConfig(policy="cosine", max_iters=300,
                                warmup_iters=20, warmup_ratio=1e-3,
                                min_lr=1e-5),
    )


_REGISTRY = {
    "upn_tiny_160k_dp03_lr6": lambda: _upernet("tiny", 0.3),
    "upn_small_160k": lambda: _upernet("small", 0.4),
    "upn_base_160k": lambda: _upernet("base", 0.5),
    "fpn_tiny_80k_dp04_lr2": lambda: _fpn("tiny", 0.4),
    "fpn_small_80k": lambda: _fpn("small", 0.4),
    "fpn_base_80k": lambda: _fpn("base", 0.5),
    "cls_tiny_imagenet": lambda: _classifier("tiny"),
    "cls_small_imagenet": lambda: _classifier("small"),
    "cls_base_imagenet": lambda: _classifier("base"),
}


def get_config(name: str) -> TrainConfig:
    if name not in _REGISTRY:
        raise KeyError(f"unknown config {name!r}; have {sorted(_REGISTRY)}")
    return dataclasses.replace(_REGISTRY[name](), name=name)


def list_configs():
    return sorted(_REGISTRY)
