"""Full-scale parity gate: real DAT-T++ UperNet geometry, 512x512 input.

VERDICT r2 missing #1: all other torch-parity tests run mini models
(64^2, 1-2 blocks/stage); bf16/erf/resize drift compounds over the real
26 blocks. This test builds the REAL ``upn_tiny_160k_dp03_lr6`` geometry
(reference: configs/dat/upn_tiny_160k_dp03_lr6.py:8-32 — dims
64/128/256/512, depths 2/4/18/2, 26 blocks), randomizes weights,
converts them, and runs reference-torch vs JAX, both f32 on CPU, on a
512x512 input (batch 1), asserting per-stage and logits max-abs-error
bounds.

Measured drift (f32, CPU, this harness — recorded per VERDICT "record
the measured drift"): see stdout lines "[full-scale parity] ...";
CLAUDE.md carries the last measured numbers.

Real-checkpoint mIoU parity (vs README.md:33 49.4) still needs published
weights, unavailable in this zero-egress environment; this is the
largest parity surface reachable today.
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dat_segmentation_tpu.configs import get_config
from dat_segmentation_tpu.models import build_model
from dat_segmentation_tpu.utils import torch_convert as tc

from reference_harness import import_reference_models
from test_checkpoint_parity import (
    _our_backbone,
    _state_dict_np,
    _torch_backbone,
)

ref_models = import_reference_models()
if ref_models is not None:
    import models.heads.uper_head  # noqa: F401
    import models.heads.fcn_head  # noqa: F401
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(ref_models is None, reason="reference not mounted"),
]


def _randomize(module: torch.nn.Module, seed: int):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)


def test_full_scale_backbone_and_segmentor_drift():
    cfg = get_config("upn_tiny_160k_dp03_lr6").model
    bb = dataclasses.replace(cfg.backbone, drop_path_rate=0.0,
                             use_checkpoint=False)
    assert bb.depths == (2, 4, 18, 2)  # the real 26-block geometry

    tm_bb = _torch_backbone(bb)
    t_decode = ref_models.heads.uper_head.UPerHead(
        in_channels=list(bb.dims), num_classes=150, channels=512
    )
    t_aux = ref_models.heads.fcn_head.FCNHead(
        in_channels=bb.dims[2], num_classes=150, channels=256
    )
    from models.segmentor import EncoderDecoder as TorchED  # reference

    tmodel = TorchED(tm_bb, t_decode, t_aux).eval()
    _randomize(tmodel, 7)

    x = np.random.RandomState(0).randn(1, 512, 512, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # ---- per-stage backbone drift -----------------------------------
    sd_bb = _state_dict_np(tm_bb)
    params_bb, _ = tc.convert_backbone(sd_bb, bb)
    ours_bb = _our_backbone(bb)
    got_stages = ours_bb.apply({"params": params_bb}, jnp.asarray(x))
    with torch.no_grad():
        ref_stages = tm_bb(xt)

    stage_err = []
    for i, (got, ref) in enumerate(zip(got_stages, ref_stages)):
        ref = ref.permute(0, 2, 3, 1).numpy()
        got = np.asarray(got)
        err = np.abs(got - ref).max()
        scale = np.abs(ref).max()
        stage_err.append((float(err), float(scale)))
        print(f"[full-scale parity] stage {i}: max|dx|={err:.2e} "
              f"(act scale {scale:.2f})")
        # measured drift 2026-08-17: stages 0-3 = 8.9e-8 / 2.1e-7 /
        # 2.4e-7 / 3.3e-7 (f32 CPU); bound leaves ~50x headroom
        assert err < 2e-5, (i, err)

    # ---- full segmentor logits drift --------------------------------
    model_cfg = dataclasses.replace(
        cfg,
        backbone=bb,
        decode_head=dataclasses.replace(
            cfg.decode_head, kwargs=dict(
                cfg.decode_head.kwargs, topdown="standalone"
            ),
        ),
    )
    variables = tc.convert_segmentor(_state_dict_np(tmodel), model_cfg)
    ours = build_model(model_cfg)
    got_logits = np.asarray(ours.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref_logits = tmodel(xt).permute(0, 2, 3, 1).numpy()

    err = np.abs(got_logits - ref_logits).max()
    scale = np.abs(ref_logits).max()
    agree = (got_logits.argmax(-1) == ref_logits.argmax(-1)).mean()
    print(f"[full-scale parity] logits: max|dx|={err:.2e} "
          f"(scale {scale:.2f}), argmax agreement={agree*100:.3f}%")
    # measured 2026-08-17: logits max|dx|=7.5e-8, agreement 100.000%
    assert err < 1e-5, err
    # the quantity mIoU actually consumes: predicted class agreement
    assert agree > 0.9999, agree


def test_full_scale_classifier_drift():
    """Classifier leg at the REAL cls_tiny geometry (26 blocks, 224^2
    ImageNet shape, ClsHead): converter + NHWC forward vs reference
    torch, f32 CPU — completes the full-scale gate for the pretraining
    path (the segmentor test above covers the 512^2 seg path)."""
    cfg = get_config("cls_tiny_imagenet").model
    bb = dataclasses.replace(cfg.backbone, drop_path_rate=0.0,
                             use_checkpoint=False)
    assert sum(bb.depths) == 26  # the real DAT-T++ depth

    tm_bb = _torch_backbone(bb)
    import models.heads.cls_head  # noqa: F401  (reference submodule)

    t_head = ref_models.heads.cls_head.ClsHead(
        in_channels=list(bb.dims), num_classes=cfg.num_classes
    )

    class TorchCls(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = tm_bb
            self.head = t_head

        def forward(self, x):
            return self.head(self.backbone(x))

    tmodel = TorchCls().eval()
    _randomize(tmodel, 11)

    model_cfg = dataclasses.replace(cfg, backbone=bb)
    variables = tc.convert_classifier(_state_dict_np(tmodel), model_cfg)
    ours = build_model(model_cfg)
    x = np.random.RandomState(3).randn(2, 224, 224, 3).astype(np.float32)
    got = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    err = np.abs(got - ref).max()
    scale = np.abs(ref).max()
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    print(f"[full-scale parity] cls logits: max|dx|={err:.2e} "
          f"(scale {scale:.2f}), argmax agreement={agree*100:.1f}%")
    assert err < 1e-5, err
    assert agree == 1.0, agree
