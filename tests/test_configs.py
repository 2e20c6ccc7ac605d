"""Config system tests: presets, overrides, mmseg-dict ingestion of the
actual reference config file."""

from pathlib import Path

import pytest

from dat_segmentation_tpu.configs import (
    get_config,
    list_configs,
    model_config_from_mmseg,
)
from dat_segmentation_tpu.configs.mmseg_compat import load_python_config
from dat_segmentation_tpu.configs.schema import replace

REF_CFG = Path("/root/reference/configs/dat/upn_tiny_160k_dp03_lr6.py")


def test_presets_cover_readme_table():
    names = list_configs()
    for head in ("upn", "fpn"):
        for size in ("tiny", "small", "base"):
            assert any(
                n.startswith(f"{head}_{size}") for n in names
            ), (head, size)
    assert any(n.startswith("cls_") for n in names)


def test_tiny_preset_matches_reference_config():
    """Our preset reproduces every knob of the shipped reference config
    (configs/dat/upn_tiny_160k_dp03_lr6.py:8-32)."""
    cfg = get_config("upn_tiny_160k_dp03_lr6")
    bb = cfg.model.backbone
    assert bb.dim_stem == 64
    assert bb.dims == (64, 128, 256, 512)
    assert bb.depths == (2, 4, 18, 2)
    assert bb.heads == (2, 4, 8, 16)
    assert bb.groups == (1, 2, 4, 8)
    assert bb.strides == (8, 4, 2, 1)
    assert bb.use_pes == (True,) * 4
    assert bb.offset_range_factor == (-1, -1, -1, -1)
    assert bb.use_dwc_mlps == (True,) * 4
    assert bb.use_lpus == (True,) * 4
    assert bb.use_conv_patches
    assert bb.ksizes == (9, 7, 5, 3)
    assert bb.drop_path_rate == 0.3
    assert bb.stage_spec[0] == ("X", "D")
    assert bb.stage_spec[1] == ("X", "D", "X", "D")
    assert len(bb.stage_spec[2]) == 18
    assert bb.stage_spec[3] == ("D", "D")
    assert cfg.model.decode_head.num_classes == 150
    assert cfg.model.auxiliary_head.channels == 256
    assert cfg.optimizer.lr == 6e-5
    assert cfg.schedule.max_iters == 160_000
    assert cfg.schedule.warmup_iters == 1500


@pytest.mark.skipif(not REF_CFG.exists(), reason="reference not mounted")
def test_ingest_reference_mmseg_config():
    model_dict = load_python_config(str(REF_CFG))
    mc = model_config_from_mmseg(model_dict)
    preset = get_config("upn_tiny_160k_dp03_lr6").model.backbone
    got = mc.backbone
    for field in (
        "dim_stem", "dims", "depths", "heads", "groups", "strides",
        "use_pes", "use_dwc_mlps", "use_lpus", "use_conv_patches",
        "ksizes", "drop_path_rate",
    ):
        assert getattr(got, field) == getattr(preset, field), field
    assert tuple(map(tuple, got.stage_spec)) == preset.stage_spec
    assert mc.decode_head.type == "UPerHead"
    assert mc.decode_head.num_classes == 150
    assert mc.auxiliary_head.type == "FCNHead"
    assert mc.aux_loss_weight == 0.4
    assert mc.aux_in_index == 2


def test_dotted_replace():
    cfg = get_config("upn_tiny_160k_dp03_lr6")
    cfg2 = replace(cfg, **{"data.batch_size": 4, "model.num_classes": 21})
    assert cfg2.data.batch_size == 4
    assert cfg2.model.num_classes == 21
    assert cfg.data.batch_size == 16  # original untouched


def test_fpn_preset_shape():
    cfg = get_config("fpn_tiny_80k_dp04_lr2")
    assert cfg.model.neck is not None
    assert cfg.model.decode_head.type == "FPNHead"
    assert cfg.model.auxiliary_head is None
    assert cfg.schedule.max_iters == 80_000
    assert cfg.model.backbone.drop_path_rate == 0.4
