"""End-to-end parity: reference torch model -> converter -> our flax model.

Builds the real reference modules (imported read-only from /root/reference),
converts their randomly-initialized state_dicts with utils/torch_convert,
and asserts the NHWC JAX forward matches the torch NCHW forward. This is
the checkpoint-converter acceptance test: any key-mapping or layout error
breaks it.
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dat_segmentation_tpu.configs.schema import (
    BackboneConfig,
    HeadConfig,
    ModelConfig,
)
from dat_segmentation_tpu.models import build_model
from dat_segmentation_tpu.models.dat import DAT
from dat_segmentation_tpu.utils import torch_convert as tc

from reference_harness import import_reference_models

ref_models = import_reference_models()
if ref_models is not None:
    import models.heads.uper_head  # noqa: F401  (reference submodules)
    import models.heads.fcn_head  # noqa: F401
    import models.heads.cls_head  # noqa: F401
pytestmark = pytest.mark.skipif(
    ref_models is None, reason="reference repo not mounted"
)


def _mini_backbone_cfg(**over) -> BackboneConfig:
    kw = dict(
        img_size=64,
        patch_size=4,
        dim_stem=16,
        dims=(16, 32, 64, 128),
        depths=(1, 2, 2, 1),
        stage_spec=(("D",), ("X", "D"), ("X", "D"), ("D",)),
        heads=(2, 2, 4, 4),
        groups=(1, 2, 2, 4),
        use_pes=(True,) * 4,
        strides=(8, 4, 2, 1),
        offset_range_factor=(-1.0, -1.0, -1.0, -1.0),
        use_dwc_mlps=(True,) * 4,
        use_lpus=(True,) * 4,
        use_conv_patches=True,
        ksizes=(9, 7, 5, 3),
        window_sizes=(7, 7, 7, 7),
        drop_path_rate=0.0,
        use_checkpoint=False,
    )
    kw.update(over)
    return BackboneConfig(**kw)


def _torch_backbone(cfg: BackboneConfig):
    m = ref_models.backbones.dat.DAT(
        img_size=cfg.img_size,
        patch_size=cfg.patch_size,
        expansion=cfg.expansion,
        dim_stem=cfg.dim_stem,
        dims=list(cfg.dims),
        depths=list(cfg.depths),
        stage_spec=[list(s) for s in cfg.stage_spec],
        heads=list(cfg.heads),
        groups=list(cfg.groups),
        use_pes=list(cfg.use_pes),
        strides=list(cfg.strides),
        offset_range_factor=list(cfg.offset_range_factor),
        use_dwc_mlps=list(cfg.use_dwc_mlps),
        use_lpus=list(cfg.use_lpus),
        use_conv_patches=cfg.use_conv_patches,
        ksizes=list(cfg.ksizes),
        window_sizes=list(cfg.window_sizes),
        drop_path_rate=cfg.drop_path_rate,
        dwc_pes=list(cfg.dwc_pes),
        fixed_pes=list(cfg.fixed_pes),
        no_offs=list(cfg.no_offs),
        layer_scale_values=list(cfg.layer_scale_values),
        use_cmt_mlps=list(cfg.use_cmt_mlps),
        log_cpb=list(cfg.log_cpb),
        use_checkpoint=False,
    )
    m.eval()
    # randomize all params (torch default init leaves rpe tables ~0)
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return m


def _our_backbone(cfg: BackboneConfig) -> DAT:
    fields = {
        f: getattr(cfg, f)
        for f in BackboneConfig.__dataclass_fields__
        if f in DAT.__dataclass_fields__
    }
    return DAT(**fields)


def _state_dict_np(m):
    return {k: v.detach().cpu().numpy() for k, v in m.state_dict().items()}


@pytest.mark.parametrize(
    "over",
    [
        {},  # DAT++ style (continuous RPE, X/D mix, LPU, DWC-MLP)
        {"layer_scale_values": (0.1, 0.1, 0.1, 0.1)},
        {"log_cpb": (True,) * 4},
        {"dwc_pes": (True,) * 4},
        {"use_conv_patches": False, "use_lpus": (False,) * 4,
         "use_dwc_mlps": (False,) * 4},
    ],
)
def test_backbone_parity(over):
    cfg = _mini_backbone_cfg(**over)
    tm = _torch_backbone(cfg)
    sd = _state_dict_np(tm)

    params, bstats = tc.convert_backbone(sd, cfg)
    ours = _our_backbone(cfg)
    x = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32)

    ref_vars = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    missing, unexpected = tc.report_diff(ref_vars["params"], params)
    assert not missing, missing
    assert not unexpected, unexpected

    variables = {"params": params}
    if bstats:
        variables["batch_stats"] = bstats
    outs = ours.apply(variables, jnp.asarray(x))

    with torch.no_grad():
        ref_outs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    for got, ref in zip(outs, ref_outs):
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-4)


def test_backbone_parity_rectangular_input():
    """Runtime size != config img_size (the seg deployment regime)."""
    cfg = _mini_backbone_cfg()
    tm = _torch_backbone(cfg)
    params, bstats = tc.convert_backbone(_state_dict_np(tm), cfg)
    ours = _our_backbone(cfg)
    x = np.random.RandomState(2).randn(1, 96, 64, 3).astype(np.float32)
    outs = ours.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref_outs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for got, ref in zip(outs, ref_outs):
        np.testing.assert_allclose(
            np.asarray(got), ref.permute(0, 2, 3, 1).numpy(),
            rtol=1e-3, atol=1e-4,
        )


def test_segmentor_parity():
    """Full EncoderDecoder (backbone + UPerHead + aux FCN) vs reference."""
    bb = _mini_backbone_cfg()
    model_cfg = ModelConfig(
        backbone=bb,
        decode_head=HeadConfig(
            "UPerHead", 19, 64, kwargs={"topdown": "standalone"}
        ),
        auxiliary_head=HeadConfig("FCNHead", 19, 32),
        num_classes=19,
    )

    tm_bb = _torch_backbone(bb)
    t_decode = ref_models.heads.uper_head.UPerHead(
        in_channels=list(bb.dims), num_classes=19, channels=64
    )
    t_aux = ref_models.heads.fcn_head.FCNHead(
        in_channels=bb.dims[2], num_classes=19, channels=32
    )
    from models.segmentor import EncoderDecoder as TorchED  # reference

    tmodel = TorchED(tm_bb, t_decode, t_aux)
    tmodel.eval()
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    sd = _state_dict_np(tmodel)
    variables = tc.convert_segmentor(sd, model_cfg)

    ours = build_model(model_cfg)
    x = np.random.RandomState(4).randn(1, 64, 64, 3).astype(np.float32)
    init_vars = ours.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    missing, unexpected = tc.report_diff(init_vars["params"], variables["params"])
    assert not missing, missing
    assert not unexpected, unexpected

    got = ours.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(got),
        ref.permute(0, 2, 3, 1).numpy(),
        rtol=1e-3,
        atol=1e-4,
    )


def test_classifier_parity():
    bb = _mini_backbone_cfg()
    model_cfg = ModelConfig(
        backbone=bb, decode_head=HeadConfig("ClsHead", 10, 0), num_classes=10
    )
    tm_bb = _torch_backbone(bb)
    t_head = ref_models.heads.cls_head.ClsHead(
        in_channels=list(bb.dims), num_classes=10
    )

    class TorchCls(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = tm_bb
            self.head = t_head

        def forward(self, x):
            return self.head(self.backbone(x))

    tmodel = TorchCls().eval()
    g = torch.Generator().manual_seed(5)
    with torch.no_grad():
        for p in t_head.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    variables = tc.convert_classifier(_state_dict_np(tmodel), model_cfg)
    ours = build_model(model_cfg)
    x = np.random.RandomState(6).randn(2, 64, 64, 3).astype(np.float32)
    got = ours.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-4)


def test_convert_cli_backbone(tmp_path, monkeypatch):
    """tools/convert.py: reference torch .pth -> orbax dir, reloadable by
    load_pretrained, with every backbone leaf equal to the converter's
    in-memory output."""
    import sys

    import tools.convert as cli
    import tools.train as train_cli

    from dat_segmentation_tpu.configs import get_config
    from dat_segmentation_tpu.configs.schema import replace as cfg_replace
    from dat_segmentation_tpu.train.checkpoint import load_pretrained

    bb = _mini_backbone_cfg()
    tm = _torch_backbone(bb)
    pth = tmp_path / "bb.pth"
    torch.save(tm.state_dict(), str(pth))

    full = get_config("upn_tiny_160k_dp03_lr6")
    model = dataclasses.replace(
        full.model,
        backbone=bb,
        decode_head=dataclasses.replace(
            full.model.decode_head, channels=16, num_classes=11
        ),
        auxiliary_head=None,
        num_classes=11,
    )
    cfg = cfg_replace(
        dataclasses.replace(full, model=model), **{"data.crop_size": (64, 64)}
    )
    monkeypatch.setattr(train_cli, "load_config", lambda name: cfg)
    out = tmp_path / "orbax"
    monkeypatch.setattr(
        sys, "argv",
        ["convert.py", "tiny", str(pth), str(out), "--kind", "backbone"],
    )
    cli.main()

    restored = load_pretrained(str(out), cfg.model)
    want, _ = tc.convert_backbone(_state_dict_np(tm), bb)
    flat_r = dict(jax.tree_util.tree_flatten_with_path(
        restored["params"]["backbone"])[0])
    flat_w = dict(jax.tree_util.tree_flatten_with_path(want)[0])
    assert set(flat_r) == set(flat_w)
    for k, v in flat_w.items():
        np.testing.assert_array_equal(np.asarray(flat_r[k]), np.asarray(v))
