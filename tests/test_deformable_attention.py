"""Parity of DeformableAttention against the reference semantics.

The torch side below is a *functional* re-expression of the reference op
(models/utils/dat_blocks.py:138-227) driven by the flax module's own
parameters, so any layout/order/convention drift in our NHWC redesign shows
up as a numeric diff. Covers all four position-bias modes plus no_off.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dat_segmentation_tpu.models.deformable_attention import DeformableAttention


def _dense_to_conv1x1(kernel):
    # flax dense kernel (in, out) -> torch conv weight (out, in, 1, 1)
    return torch.from_numpy(np.asarray(kernel)).t().reshape(
        kernel.shape[1], kernel.shape[0], 1, 1
    )


def _conv_hwio_to_oihw(kernel):
    return torch.from_numpy(np.asarray(kernel)).permute(3, 2, 0, 1).contiguous()


def torch_forward(x_nchw, params, cfg):
    """Reference DAttentionBaseline.forward expressed functionally in torch."""
    B, C, H, W = x_nchw.shape
    heads, g = cfg["n_heads"], cfg["n_groups"]
    hc = C // heads
    h_g = heads // g
    Cg = C // g
    stride, ksize = cfg["stride"], cfg["ksize"]
    orf = cfg["offset_range_factor"]
    x = x_nchw

    def conv1x1(t, name):
        w = _dense_to_conv1x1(params[name]["kernel"])
        b = params[name].get("bias")
        b = torch.from_numpy(np.asarray(b)) if b is not None else None
        return F.conv2d(t, w, b)

    q = conv1x1(x, "proj_q")

    q_off = q.reshape(B, g, Cg, H, W).reshape(B * g, Cg, H, W)
    dw_w = _conv_hwio_to_oihw(params["offset_dwc"]["kernel"])
    dw_b = torch.from_numpy(np.asarray(params["offset_dwc"]["bias"]))
    pad = ksize // 2 if ksize != stride else 0
    off = F.conv2d(q_off, dw_w, dw_b, stride=stride, padding=pad, groups=Cg)
    # LayerNorm over channels
    ln = params["offset_ln"]
    off = off.permute(0, 2, 3, 1)
    off = F.layer_norm(
        off,
        (Cg,),
        torch.from_numpy(np.asarray(ln["scale"])),
        torch.from_numpy(np.asarray(ln["bias"])),
    )
    off = F.gelu(off).permute(0, 3, 1, 2)
    off_w = _dense_to_conv1x1(params["offset_proj"]["kernel"])
    offset = F.conv2d(off, off_w)  # (B*g, 2, Hk, Wk)
    Hk, Wk = offset.shape[2], offset.shape[3]
    Ns = Hk * Wk

    if orf >= 0 and not cfg["no_off"]:
        rng = torch.tensor([1.0 / (Hk - 1.0), 1.0 / (Wk - 1.0)]).reshape(1, 2, 1, 1)
        offset = offset.tanh().mul(rng).mul(orf)

    offset = offset.permute(0, 2, 3, 1)  # (B*g, Hk, Wk, 2) (y, x)
    ref_y, ref_x = torch.meshgrid(
        torch.linspace(0.5, Hk - 0.5, Hk),
        torch.linspace(0.5, Wk - 0.5, Wk),
        indexing="ij",
    )
    ref = torch.stack((ref_y, ref_x), -1)
    ref[..., 1] = ref[..., 1] / (Wk - 1.0) * 2.0 - 1.0
    ref[..., 0] = ref[..., 0] / (Hk - 1.0) * 2.0 - 1.0
    ref = ref[None].expand(B * g, -1, -1, -1)

    if cfg["no_off"]:
        offset = torch.zeros_like(offset)
    pos = offset + ref if orf >= 0 else (offset + ref).clamp(-1.0, 1.0)

    if cfg["no_off"]:
        x_sampled = F.avg_pool2d(x, kernel_size=stride, stride=stride)
        Hk, Wk = x_sampled.shape[2:]
        Ns = Hk * Wk
    else:
        x_sampled = F.grid_sample(
            x.reshape(B * g, Cg, H, W),
            pos[..., (1, 0)],
            mode="bilinear",
            align_corners=True,
        )
    x_sampled = x_sampled.reshape(B, C, 1, Ns)

    q_ = q.reshape(B * heads, hc, H * W)
    k = conv1x1(x_sampled, "proj_k").reshape(B * heads, hc, Ns)
    v = conv1x1(x_sampled, "proj_v").reshape(B * heads, hc, Ns)
    attn = torch.einsum("bcm,bcn->bmn", q_, k) * (hc ** -0.5)

    lepe = None
    if cfg["use_pe"] and not cfg["no_off"]:
        if cfg["dwc_pe"]:
            w = _conv_hwio_to_oihw(params["rpe_dwc"]["kernel"])
            b = torch.from_numpy(np.asarray(params["rpe_dwc"]["bias"]))
            lepe = F.conv2d(q.reshape(B, C, H, W), w, b, padding=1, groups=C)
            lepe = lepe.reshape(B * heads, hc, H * W)
        elif cfg["fixed_pe"]:
            table = torch.from_numpy(np.asarray(params["rpe_table"]))
            bias = table[None].expand(B, -1, -1, -1)
            bias = F.interpolate(
                bias, size=(H * W, Ns), mode="bilinear", align_corners=True
            )
            attn = attn + bias.reshape(B * heads, H * W, Ns)
        else:
            qy, qx = torch.meshgrid(
                torch.arange(0, H, dtype=torch.float32),
                torch.arange(0, W, dtype=torch.float32),
                indexing="ij",
            )
            qg = torch.stack((qy, qx), -1)
            qg[..., 1] = qg[..., 1] / (W - 1.0) * 2.0 - 1.0
            qg[..., 0] = qg[..., 0] / (H - 1.0) * 2.0 - 1.0
            qg = qg[None].expand(B * g, -1, -1, -1)
            disp = (
                qg.reshape(B * g, H * W, 2).unsqueeze(2)
                - pos.reshape(B * g, Ns, 2).unsqueeze(1)
            )
            if cfg["log_cpb"]:
                disp = disp * 4.0
                disp = (
                    torch.sign(disp)
                    * torch.log2(torch.abs(disp) + 1.0)
                    / np.log2(8.0)
                )
                w1 = torch.from_numpy(np.asarray(params["cpb_fc1"]["kernel"]))
                b1 = torch.from_numpy(np.asarray(params["cpb_fc1"]["bias"]))
                w2 = torch.from_numpy(np.asarray(params["cpb_fc2"]["kernel"]))
                hbias = torch.relu(disp @ w1 + b1) @ w2  # (B*g, HW, Ns, h_g)
                hbias = hbias.permute(0, 3, 1, 2).reshape(B * heads, H * W, Ns)
                attn = attn + hbias
            else:
                table = torch.from_numpy(np.asarray(params["rpe_table"]))
                bias = table[None].expand(B, -1, -1, -1)
                bias = bias.reshape(B * g, h_g, *table.shape[1:])
                abias = F.grid_sample(
                    bias,
                    (disp * 0.5)[..., (1, 0)],
                    mode="bilinear",
                    align_corners=True,
                )
                attn = attn + abias.reshape(B * heads, H * W, Ns)

    attn = F.softmax(attn, dim=2)
    out = torch.einsum("bmn,bcn->bcm", attn, v)
    if lepe is not None:
        out = out + lepe
    out = out.reshape(B, C, H, W)
    return conv1x1(out, "proj_out")


CASES = [
    # (mode flags, stride, ksize, orf)
    dict(use_pe=True, dwc_pe=False, fixed_pe=False, log_cpb=False, no_off=False,
         stride=2, ksize=5, offset_range_factor=-1.0),  # DAT++ continuous RPE
    dict(use_pe=True, dwc_pe=False, fixed_pe=False, log_cpb=False, no_off=False,
         stride=1, ksize=3, offset_range_factor=2.0),   # tanh-scaled offsets
    dict(use_pe=True, dwc_pe=True, fixed_pe=False, log_cpb=False, no_off=False,
         stride=2, ksize=2, offset_range_factor=-1.0),  # dwc_pe, ksize==stride
    dict(use_pe=True, dwc_pe=False, fixed_pe=True, log_cpb=False, no_off=False,
         stride=2, ksize=5, offset_range_factor=-1.0),  # fixed_pe
    dict(use_pe=True, dwc_pe=False, fixed_pe=False, log_cpb=True, no_off=False,
         stride=2, ksize=5, offset_range_factor=-1.0),  # log_cpb
    dict(use_pe=True, dwc_pe=False, fixed_pe=False, log_cpb=False, no_off=True,
         stride=2, ksize=5, offset_range_factor=-1.0),  # no_off ablation
]


@pytest.mark.parametrize("case", CASES)
def test_deformable_attention_parity(case):
    B, H, W, C = 2, 8, 12, 16
    heads, groups = 4, 2
    cfg = dict(n_heads=heads, n_groups=groups, **case)

    module = DeformableAttention(
        dim=C,
        n_heads=heads,
        n_groups=groups,
        stride=case["stride"],
        ksize=case["ksize"],
        q_size=(H, W),
        offset_range_factor=case["offset_range_factor"],
        use_pe=case["use_pe"],
        dwc_pe=case["dwc_pe"],
        fixed_pe=case["fixed_pe"],
        log_cpb=case["log_cpb"],
        no_off=case["no_off"],
    )
    rng = np.random.RandomState(0)
    x = rng.randn(B, H, W, C).astype(np.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # non-zero rpe_table to actually exercise the bias path
    params = jax.tree.map(
        lambda p: p
        if p.ndim != 3
        else jnp.asarray(rng.randn(*p.shape).astype(np.float32) * 0.1),
        variables["params"],
    )

    got = np.asarray(module.apply({"params": params}, jnp.asarray(x)))

    ref = torch_forward(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        jax.tree.map(np.asarray, params),
        cfg,
    )
    ref = ref.permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
