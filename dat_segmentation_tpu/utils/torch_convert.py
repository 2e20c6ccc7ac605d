"""One-shot torch -> JAX checkpoint conversion.

Maps reference state_dicts onto our flax variable trees:
* layout transposes: conv OIHW -> HWIO, 1x1 convs -> dense (in,out),
  linear (out,in) -> (in,out);
* LayerNormProxy ``*.norm.weight`` -> ``scale`` etc.;
* BatchNorm running stats -> the ``batch_stats`` collection;
* both key schemas: the reference's standalone modules
  (models/backbones/dat.py, models/heads/*) and mmseg published
  checkpoints (psp_modules/bottleneck/conv_seg naming).

Loading mirrors the reference's tolerant loader (models/backbones/loading.py:10-37):
unwrap ``state_dict``/``model_state`` keys, strip ``module.`` prefixes, and
report missing/unexpected keys instead of failing.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _t(arr) -> np.ndarray:
    return np.asarray(arr, dtype=np.float32)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load a checkpoint file -> flat {key: np.ndarray}. Unwraps
    ``state_dict`` / ``model_state`` / ``model`` wrappers and strips
    ``module.`` prefixes (reference loading.py:17-20)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model_state", "model"):
        if isinstance(ckpt, dict) and key in ckpt and isinstance(ckpt[key], dict):
            ckpt = ckpt[key]
            break
    out = {}
    for k, v in ckpt.items():
        if k.startswith("module."):
            k = k[7:]
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().float().numpy()
    return out


# ---------------------------------------------------------------------------
# Backbone key translation
# ---------------------------------------------------------------------------


def _conv_entry(sd, key, use_bias=True, dense_if_1x1=True):
    """torch conv weight(+bias) -> flax {'kernel', 'bias'} (HWIO or dense)."""
    w = _t(sd[key + ".weight"])
    entry = {}
    if w.ndim == 4 and w.shape[2] == w.shape[3] == 1 and dense_if_1x1:
        entry["kernel"] = w[:, :, 0, 0].T  # (out,in,1,1) -> (in,out)
    elif w.ndim == 4:
        entry["kernel"] = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    else:  # linear (out,in) -> (in,out)
        entry["kernel"] = w.T
    if use_bias and key + ".bias" in sd:
        entry["bias"] = _t(sd[key + ".bias"])
    return entry


def _ln_entry(sd, key):
    return {"scale": _t(sd[key + ".weight"]), "bias": _t(sd[key + ".bias"])}


def _bn_entries(sd, key):
    params = {"scale": _t(sd[key + ".weight"]), "bias": _t(sd[key + ".bias"])}
    stats = {
        "mean": _t(sd[key + ".running_mean"]),
        "var": _t(sd[key + ".running_var"]),
    }
    return params, stats


def convert_backbone(
    sd: Mapping[str, np.ndarray],
    backbone_cfg,
    prefix: str = "",
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Translate a reference DAT backbone state_dict subtree.

    Returns (params, batch_stats) nested dicts matching models/dat.py names.
    """
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    cfg = backbone_cfg

    def has(k):
        return prefix + k + ".weight" in sd or prefix + k in sd

    # --- stem (reference dat.py:213-222) ---
    if cfg.use_conv_patches:
        p["stem_conv1"] = _conv_entry(sd, prefix + "patch_proj.0", dense_if_1x1=False)
        p["stem_ln1"] = _ln_entry(sd, prefix + "patch_proj.1.norm")
        p["stem_conv2"] = _conv_entry(sd, prefix + "patch_proj.3", dense_if_1x1=False)
        p["stem_ln2"] = _ln_entry(sd, prefix + "patch_proj.4.norm")
    else:
        p["stem_conv1"] = _conv_entry(sd, prefix + "patch_proj.0", dense_if_1x1=False)
        p["stem_ln1"] = _ln_entry(sd, prefix + "patch_proj.1.norm")

    for i in range(4):
        sp = f"{prefix}stages.{i}."
        stage: Dict[str, Any] = {}
        stage_bs: Dict[str, Any] = {}
        if has(f"stages.{i}.proj"):
            stage["proj"] = _conv_entry(sd, sp + "proj", dense_if_1x1=False)
        spec = cfg.stage_spec[i]
        for d in range(cfg.depths[i]):
            if cfg.use_lpus[i]:
                stage[f"lpu_{d}"] = _conv_entry(
                    sd, sp + f"local_perception_units.{d}", dense_if_1x1=False
                )
            # MLP
            mlp: Dict[str, Any] = {}
            if cfg.use_dwc_mlps[i]:
                mlp["fc1"] = _conv_entry(sd, sp + f"mlps.{d}.linear1.0")
                mlp["dwc"] = _conv_entry(
                    sd, sp + f"mlps.{d}.dwc", dense_if_1x1=False
                )
                mlp["fc2"] = _conv_entry(sd, sp + f"mlps.{d}.linear2.0")
                if cfg.use_cmt_mlps[i]:
                    mlp["bn1"], m1 = _bn_entries(sd, sp + f"mlps.{d}.linear1.2")
                    mlp["bn2"], m2 = _bn_entries(sd, sp + f"mlps.{d}.bn")
                    mlp["bn3"], m3 = _bn_entries(sd, sp + f"mlps.{d}.linear2.1")
                    stage_bs[f"mlp_{d}"] = {"bn1": m1, "bn2": m2, "bn3": m3}
            else:
                mlp["fc1"] = _conv_entry(sd, sp + f"mlps.{d}.chunk.linear1")
                mlp["fc2"] = _conv_entry(sd, sp + f"mlps.{d}.chunk.linear2")
            stage[f"mlp_{d}"] = mlp

            if spec[d] == "X":
                stage[f"conv_attn_{d}"] = _conv_entry(
                    sd, sp + f"attns.{d}", dense_if_1x1=False
                )
                stage[f"ln_cnvnxt_{d}"] = _ln_entry(sd, sp + f"ln_cnvnxt.{d}.norm")
            elif spec[d] == "D":
                stage[f"norm1_{d}"] = _ln_entry(sd, sp + f"layer_norms.{2*d}.norm")
                stage[f"norm2_{d}"] = _ln_entry(
                    sd, sp + f"layer_norms.{2*d+1}.norm"
                )
                ap = sp + f"attns.{d}."
                attn: Dict[str, Any] = {
                    "proj_q": _conv_entry(sd, ap + "proj_q"),
                    "proj_k": _conv_entry(sd, ap + "proj_k"),
                    "proj_v": _conv_entry(sd, ap + "proj_v"),
                    "proj_out": _conv_entry(sd, ap + "proj_out"),
                    "offset_dwc": _conv_entry(
                        sd, ap + "conv_offset.0", dense_if_1x1=False
                    ),
                    "offset_ln": _ln_entry(sd, ap + "conv_offset.1.norm"),
                    "offset_proj": _conv_entry(sd, ap + "conv_offset.3"),
                }
                if cfg.use_pes[i] and not cfg.no_offs[i]:
                    if cfg.dwc_pes[i]:
                        attn["rpe_dwc"] = _conv_entry(
                            sd, ap + "rpe_table", dense_if_1x1=False
                        )
                    elif cfg.log_cpb[i]:
                        attn["cpb_fc1"] = _conv_entry(sd, ap + "rpe_table.0")
                        attn["cpb_fc2"] = _conv_entry(sd, ap + "rpe_table.2")
                    else:  # fixed_pe or continuous table: raw parameter
                        attn["rpe_table"] = _t(sd[ap + "rpe_table"])
                stage[f"attn_{d}"] = attn
                if cfg.layer_scale_values[i] > 0:
                    stage[f"ls1_{d}"] = {
                        "gamma": _t(sd[sp + f"layer_scales.{2*d}.gamma"])
                    }
                    stage[f"ls2_{d}"] = {
                        "gamma": _t(sd[sp + f"layer_scales.{2*d+1}.gamma"])
                    }
        p[f"stage_{i}"] = stage
        if stage_bs:
            bs[f"stage_{i}"] = stage_bs
        if i in cfg.out_indices:
            p[f"out_norm_{i}"] = _ln_entry(sd, prefix + f"norms.{i}.norm")
        if i < 3:
            p[f"down_conv_{i}"] = _conv_entry(
                sd, prefix + f"down_projs.{i}.0", use_bias=False,
                dense_if_1x1=False,
            )
            p[f"down_ln_{i}"] = _ln_entry(sd, prefix + f"down_projs.{i}.1.norm")
    return p, bs


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------


def _convbnrelu(sd, conv_key, bn_key):
    params = {"conv": _conv_entry(sd, conv_key, dense_if_1x1=False)}
    params["bn"], stats = _bn_entries(sd, bn_key)
    return params, {"bn": stats}


def convert_uper_head(sd, prefix, pool_scales=(1, 2, 3, 6), n_in=4):
    """Reference standalone UPerHead (models/heads/uper_head.py) or mmseg
    UPerHead key naming (psp_modules / bottleneck / conv_seg)."""
    p, bs = {}, {}
    mmseg = prefix + "psp_modules.0.1.conv.weight" in sd

    def cbr(name, conv_key, bn_key):
        p[name], bs[name] = _convbnrelu(sd, conv_key, bn_key)

    for j in range(len(pool_scales)):
        if mmseg:
            cbr(f"ppm_{j}", f"{prefix}psp_modules.{j}.1.conv",
                f"{prefix}psp_modules.{j}.1.bn")
        else:
            cbr(f"ppm_{j}", f"{prefix}ppm_modules.{j}.1",
                f"{prefix}ppm_modules.{j}.2")
    if mmseg:
        cbr("ppm_bottleneck", f"{prefix}bottleneck.conv", f"{prefix}bottleneck.bn")
    else:
        cbr("ppm_bottleneck", f"{prefix}ppm_bottleneck.0",
            f"{prefix}ppm_bottleneck.1")
    for i in range(n_in - 1):
        if mmseg:
            cbr(f"lateral_{i}", f"{prefix}lateral_convs.{i}.conv",
                f"{prefix}lateral_convs.{i}.bn")
            cbr(f"fpn_{i}", f"{prefix}fpn_convs.{i}.conv",
                f"{prefix}fpn_convs.{i}.bn")
        else:
            cbr(f"lateral_{i}", f"{prefix}lateral_convs.{i}.0",
                f"{prefix}lateral_convs.{i}.1")
            cbr(f"fpn_{i}", f"{prefix}fpn_convs.{i}.0",
                f"{prefix}fpn_convs.{i}.1")
    if mmseg:
        cbr("fuse_bottleneck", f"{prefix}fpn_bottleneck.conv",
            f"{prefix}fpn_bottleneck.bn")
        p["cls_seg"] = _conv_entry(sd, prefix + "conv_seg")
    else:
        cbr("fuse_bottleneck", f"{prefix}fuse_bottleneck.0",
            f"{prefix}fuse_bottleneck.1")
        p["cls_seg"] = _conv_entry(sd, prefix + "cls_seg")
    return p, bs


def convert_fcn_head(sd, prefix, num_convs=1):
    p, bs = {}, {}
    mmseg = prefix + "convs.0.conv.weight" in sd
    for i in range(num_convs):
        if mmseg:
            p[f"conv_{i}"], bs[f"conv_{i}"] = _convbnrelu(
                sd, f"{prefix}convs.{i}.conv", f"{prefix}convs.{i}.bn"
            )
        else:
            p[f"conv_{i}"], bs[f"conv_{i}"] = _convbnrelu(
                sd, f"{prefix}convs.{3*i}", f"{prefix}convs.{3*i+1}"
            )
    key = "conv_seg" if mmseg else "cls_seg"
    p["cls_seg"] = _conv_entry(sd, prefix + key)
    return p, bs


def convert_fpn_neck(sd, prefix, n_in=4):
    """mmseg FPN neck: lateral_convs.{i}.conv, fpn_convs.{i}.conv."""
    p = {}
    for i in range(n_in):
        p[f"lateral_{i}"] = _conv_entry(sd, f"{prefix}lateral_convs.{i}.conv")
        p[f"fpn_{i}"] = _conv_entry(
            sd, f"{prefix}fpn_convs.{i}.conv", dense_if_1x1=False
        )
    return p


def convert_fpn_head(sd, prefix, feature_strides=(4, 8, 16, 32)):
    """mmseg FPNHead: scale_heads.{i}.{k}.conv/bn (+upsample slots skipped)."""
    import math

    p, bs = {}, {}
    for i, fs in enumerate(feature_strides):
        head_length = max(1, int(math.log2(fs) - math.log2(feature_strides[0])))
        for k in range(head_length):
            # torch Sequential interleaves Upsample modules (no params);
            # mmseg indexes ConvModules at positions k (Upsample is inside
            # the same index as a submodule list) — keys are scale_heads.i.k.conv
            p[f"scale_{i}_{k}"], bs[f"scale_{i}_{k}"] = _convbnrelu(
                sd, f"{prefix}scale_heads.{i}.{k}.conv",
                f"{prefix}scale_heads.{i}.{k}.bn",
            )
    p["cls_seg"] = _conv_entry(sd, prefix + "conv_seg")
    return p, bs


def convert_cls_head(sd, prefix):
    p = {
        "norm": _ln_entry(sd, prefix + "norm.norm"),
        "fc": _conv_entry(sd, prefix + "fc"),
    }
    return p, {}


# ---------------------------------------------------------------------------
# Full models
# ---------------------------------------------------------------------------


def convert_segmentor(sd: Mapping[str, np.ndarray], model_cfg):
    """EncoderDecoder state_dict -> {'params': ..., 'batch_stats': ...}."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    bp, bbs = convert_backbone(sd, model_cfg.backbone, prefix="backbone.")
    params["backbone"] = bp
    if bbs:
        stats["backbone"] = bbs

    n_in = len(model_cfg.backbone.out_indices)
    head = model_cfg.decode_head
    if head.type == "UPerHead":
        hp, hbs = convert_uper_head(
            sd, "decode_head.",
            tuple(head.kwargs.get("pool_scales", (1, 2, 3, 6))), n_in,
        )
    elif head.type == "FPNHead":
        hp, hbs = convert_fpn_head(
            sd, "decode_head.",
            tuple(head.kwargs.get("feature_strides", (4, 8, 16, 32))),
        )
    elif head.type == "FCNHead":
        hp, hbs = convert_fcn_head(
            sd, "decode_head.", head.kwargs.get("num_convs", 1)
        )
    else:
        raise KeyError(head.type)
    params["decode_head"] = hp
    if hbs:
        stats["decode_head"] = hbs

    if model_cfg.auxiliary_head is not None:
        ap, abs_ = convert_fcn_head(
            sd, "auxiliary_head.",
            model_cfg.auxiliary_head.kwargs.get("num_convs", 1),
        )
        params["auxiliary_head"] = ap
        if abs_:
            stats["auxiliary_head"] = abs_

    if model_cfg.neck is not None:
        params["neck"] = convert_fpn_neck(sd, "neck.", n_in)

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def convert_classifier(sd: Mapping[str, np.ndarray], model_cfg):
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    bp, bbs = convert_backbone(sd, model_cfg.backbone, prefix="backbone.")
    params["backbone"] = bp
    if bbs:
        stats["backbone"] = bbs
    hp, _ = convert_cls_head(sd, "head.")
    params["head"] = hp
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def report_diff(variables, converted) -> Tuple[list, list]:
    """Missing/unexpected leaf paths between a model's init variables and a
    converted tree — the tolerant-load report (reference loading.py:29-35)."""
    import jax

    def leaves(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {jax.tree_util.keystr(k): v.shape for k, v in flat}

    want = leaves(variables)
    have = leaves(converted)
    missing = sorted(set(want) - set(have))
    unexpected = sorted(set(have) - set(want))
    return missing, unexpected
