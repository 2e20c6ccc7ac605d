"""Shape/smoke tests for backbone, heads, segmentor, builder, presets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dat_segmentation_tpu.configs import get_config, list_configs
from dat_segmentation_tpu.models import build_model, build_model_from_config
from dat_segmentation_tpu.models.dat import DAT


def tiny_backbone(**over):
    kw = dict(
        img_size=64,
        patch_size=4,
        dim_stem=16,
        dims=(16, 32, 64, 128),
        depths=(1, 1, 2, 1),
        stage_spec=(("D",), ("X",), ("X", "D"), ("D",)),
        heads=(2, 2, 4, 4),
        groups=(1, 2, 2, 4),
        use_pes=(True,) * 4,
        strides=(8, 4, 2, 1),
        offset_range_factor=(-1, -1, -1, -1),
        use_dwc_mlps=(True,) * 4,
        use_lpus=(True,) * 4,
        use_conv_patches=True,
        ksizes=(9, 7, 5, 3),
        drop_path_rate=0.1,
    )
    kw.update(over)
    return DAT(**kw)


def test_backbone_pyramid_shapes():
    m = tiny_backbone()
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vars_, x)
    assert [o.shape for o in outs] == [
        (2, 16, 16, 16),
        (2, 8, 8, 32),
        (2, 4, 4, 64),
        (2, 2, 2, 128),
    ]


def test_backbone_rectangular_input():
    """Runtime H,W may differ from config img_size (seg uses 512 crops
    against a 224-configured backbone)."""
    m = tiny_backbone()
    x = jnp.zeros((1, 96, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vars_, x)
    assert outs[0].shape == (1, 24, 16, 16)
    assert outs[3].shape == (1, 3, 2, 128)


@pytest.mark.parametrize("preset", ["upn_tiny_160k_dp03_lr6", "fpn_tiny_80k_dp04_lr2"])
def test_segmentor_presets_forward(preset):
    cfg = get_config(preset)
    # shrink for test speed: 1-block stages
    import dataclasses

    bb = dataclasses.replace(
        cfg.model.backbone,
        depths=(1, 1, 2, 1),
        dims=(16, 32, 64, 128),
        dim_stem=16,
        heads=(2, 2, 4, 4),
        groups=(1, 2, 2, 4),
        stage_spec=(("D",), ("D",), ("X", "D"), ("D", )),
    )
    model_cfg = dataclasses.replace(cfg.model, backbone=bb)
    model = build_model(model_cfg)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(
        {"params": jax.random.PRNGKey(0)}, x, train=False
    )
    logits = model.apply(vars_, x, train=False)
    assert logits.shape == (1, 64, 64, 150)

    # training mode returns (logits, aux) when an aux head exists
    out = model.apply(
        vars_,
        x,
        train=True,
        deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    res = out[0]
    if model_cfg.auxiliary_head is not None:
        logits, aux = res
        assert aux.shape == (1, 64, 64, 150)
    else:
        assert res.shape == (1, 64, 64, 150)


def test_classifier_forward():
    cfg = get_config("cls_tiny_imagenet")
    import dataclasses

    bb = dataclasses.replace(
        cfg.model.backbone,
        depths=(1, 1, 1, 1),
        dims=(16, 32, 64, 128),
        dim_stem=16,
        heads=(2, 2, 4, 4),
        groups=(1, 2, 2, 4),
        stage_spec=(("D",), ("D",), ("D",), ("D",)),
    )
    model = build_model(dataclasses.replace(cfg.model, backbone=bb))
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, x)
    logits = model.apply(vars_, x)
    assert logits.shape == (2, 1000)


def test_all_presets_instantiate():
    for name in list_configs():
        model = build_model_from_config(name)
        assert model is not None


def test_unsupported_spec_raises():
    m = tiny_backbone(stage_spec=(("L",), ("D",), ("D",), ("D",)))
    with pytest.raises(NotImplementedError):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
