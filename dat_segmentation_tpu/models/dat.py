"""DAT / DAT++ hierarchical backbone (4-stage pyramid), TPU-native.

NHWC redesign of the reference backbone (reference: models/backbones/dat.py:34-312).
Per stage: optional 1x1 input proj, then ``depths`` blocks dispatched by a
``stage_spec`` character — 'D' = deformable attention block (pre-LN residual
with LayerScale + DropPath), 'X' = ConvNeXt-ish depthwise-conv block. An
optional local perception unit (residual 3x3 depthwise) precedes every
block. Stages are separated by stride-2 conv downsamplers; each requested
output index gets its own LayerNorm.

Quirks faithfully kept from the reference:
* 'X' blocks have NO residual connection around the conv/MLP pair
  (dat.py:140-144) — DropPath there rescales/zeroes the whole branch;
* the pre-attention LayerNorm slot for 'X' blocks is Identity; the real
  norm sits between the conv and the MLP (``ln_cnvnxt``);
* PE-table shapes derive from the config-time ``img_size`` (224), not the
  runtime input size.

Activation rematerialisation uses ``nn.remat`` on the stage body —
the jax.checkpoint equivalent of the reference's per-stage
``torch.utils.checkpoint`` (dat.py:161-165).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
from flax import linen as nn

from .deformable_attention import DeformableAttention
from .layers import (
    CmtConvMlp,
    ConvMlp,
    ConvMlpParams,
    ConvParams,
    DropPath,
    LayerNorm2d,
    LayerNormParams,
    LayerScale,
    Mlp,
    conv2d,
    gelu,
)


class TransformerStage(nn.Module):
    """One pyramid stage (reference: dat.py:34-165)."""

    fmap_size: Tuple[int, int]  # config-time feature size (PE tables only)
    window_size: int
    dim_embed: int
    depths: int
    stage_spec: Sequence[str]
    n_groups: int
    use_pe: bool
    heads: int
    stride: int
    offset_range_factor: float
    dwc_pe: bool
    no_off: bool
    fixed_pe: bool
    attn_drop: float
    proj_drop: float
    expansion: int
    drop: float
    drop_path_rates: Sequence[float]
    use_dwc_mlp: bool
    ksize: int
    layer_scale_value: float
    use_lpu: bool
    use_cmt_mlp: bool
    log_cpb: bool
    kernel_impl: str = "xla"  # 'xla' | 'pallas' | 'auto' | 'gather'

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True, train: bool = False
    ) -> jax.Array:
        dim = self.dim_embed
        if x.shape[-1] != dim:
            x = conv2d(x, dim, 1, name="proj")

        if self.use_dwc_mlp:
            mlp_cls = CmtConvMlp if self.use_cmt_mlp else ConvMlp
        else:
            mlp_cls = Mlp

        import os

        H, W = x.shape[1], x.shape[2]
        impl = self.kernel_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        # Fused X-block Pallas kernel (LPU + window dwconv + LN + ConvMLP
        # in one VMEM-resident program). Measured on v5e it LOSES to the
        # unfused XLA chain (all-X ablation b8: 33.1 vs 24.8 ms) — the
        # floor is VPU tap arithmetic, not HBM traffic, and the kernel's
        # roll/mask overhead adds to it — so the TPU default is OFF
        # (DAT_TPU_XBLOCK=pallas opts in). On non-TPU backends the fused
        # path stays on so interpret-mode tests exercise the kernel.
        from ..ops import valid_extent as _ve

        fuse_x = (
            impl == "pallas"
            and self.use_dwc_mlp
            and not self.use_cmt_mlp
            and (self.drop == 0.0 or deterministic)
            and H % 8 == 0
            and W % 8 == 0
            # exact padded inference masks extents through the unfused
            # conv2d path; the fused kernel has no per-sample sizes
            and _ve.current() is None
            and os.environ.get(
                "DAT_TPU_XBLOCK",
                "xla" if jax.default_backend() == "tpu" else "pallas",
            ) == "pallas"
        )

        for d in range(self.depths):
            spec = self.stage_spec[d]

            if self.use_lpu and not (fuse_x and spec == "X"):
                x = x + conv2d(
                    x, dim, 3, padding=1, groups=dim, name=f"lpu_{d}"
                )

            dp = DropPath(self.drop_path_rates[d], name=f"drop_path_{d}")
            mlp_kwargs = dict(deterministic=deterministic)
            if mlp_cls is CmtConvMlp:
                mlp_kwargs["train"] = train

            if spec == "X" and fuse_x:
                from ..ops.pallas.x_block import fused_x_block

                if self.use_lpu:
                    w3, b3 = ConvParams(
                        dim, 3, dim, groups=dim, name=f"lpu_{d}"
                    )()
                else:
                    w3 = b3 = None
                w7, b7 = ConvParams(
                    dim, self.window_size, dim, groups=dim,
                    name=f"conv_attn_{d}",
                )()
                g_ln, b_ln = LayerNormParams(dim, name=f"ln_cnvnxt_{d}")()
                (wf1, bf1), (wd, bd), (wf2, bf2) = ConvMlpParams(
                    dim, self.expansion, name=f"mlp_{d}"
                )()
                y = fused_x_block(
                    x, w3, b3, w7, b7, g_ln, b_ln, wf1, bf1, wd, bd,
                    wf2, bf2, self.window_size, self.use_lpu,
                    jax.default_backend() != "tpu",
                )
                x = dp(y, deterministic=deterministic)
            elif spec == "X":
                # ConvNeXt-ish block; deliberately no residual (see header).
                y = conv2d(
                    x, dim, self.window_size,
                    padding=self.window_size // 2, groups=dim,
                    name=f"conv_attn_{d}",
                )
                y = LayerNorm2d(name=f"ln_cnvnxt_{d}")(y)
                y = mlp_cls(
                    self.expansion, self.drop, name=f"mlp_{d}"
                )(y, **mlp_kwargs)
                x = dp(y, deterministic=deterministic)
            elif spec == "D":
                y = LayerNorm2d(name=f"norm1_{d}")(x)
                y = DeformableAttention(
                    dim=dim,
                    n_heads=self.heads,
                    n_groups=self.n_groups,
                    stride=self.stride,
                    ksize=self.ksize,
                    q_size=self.fmap_size,
                    offset_range_factor=self.offset_range_factor,
                    use_pe=self.use_pe,
                    dwc_pe=self.dwc_pe,
                    fixed_pe=self.fixed_pe,
                    log_cpb=self.log_cpb,
                    no_off=self.no_off,
                    attn_drop=self.attn_drop,
                    proj_drop=self.proj_drop,
                    kernel_impl=self.kernel_impl,
                    name=f"attn_{d}",
                )(y, deterministic=deterministic)
                if self.layer_scale_value > 0:
                    y = LayerScale(self.layer_scale_value, name=f"ls1_{d}")(y)
                x = dp(y, deterministic=deterministic) + x
                if fuse_x:
                    # same fused kernel, MLP-only mode (in-kernel LN)
                    from ..ops.pallas.x_block import fused_conv_mlp

                    g_ln, b_ln = LayerNormParams(dim, name=f"norm2_{d}")()
                    (wf1, bf1), (wd, bd), (wf2, bf2) = ConvMlpParams(
                        dim, self.expansion, name=f"mlp_{d}"
                    )()
                    y = fused_conv_mlp(
                        x, g_ln, b_ln, wf1, bf1, wd, bd, wf2, bf2,
                        jax.default_backend() != "tpu",
                    )
                else:
                    y = LayerNorm2d(name=f"norm2_{d}")(x)
                    y = mlp_cls(
                        self.expansion, self.drop, name=f"mlp_{d}"
                    )(y, **mlp_kwargs)
                if self.layer_scale_value > 0:
                    y = LayerScale(self.layer_scale_value, name=f"ls2_{d}")(y)
                x = dp(y, deterministic=deterministic) + x
            else:
                raise NotImplementedError(f"stage_spec {spec!r} not supported")
        return x


class DAT(nn.Module):
    """DAT backbone returning one NHWC feature map per out_index.

    Constructor knobs mirror the reference (dat.py:169-203); unsupported
    legacy specs ('L', 'S', 'N', 'E') raise like the reference fork does.
    """

    img_size: int = 224
    patch_size: int = 4
    expansion: int = 4
    dim_stem: int = 96
    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 2, 6, 2)
    heads: Sequence[int] = (3, 6, 12, 24)
    window_sizes: Sequence[int] = (7, 7, 7, 7)
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    strides: Sequence[int] = (-1, -1, -1, -1)
    offset_range_factor: Sequence[float] = (1, 2, 3, 4)
    stage_spec: Sequence[Sequence[str]] = (
        ("L", "D"), ("L", "D"), ("L", "D", "L", "D", "L", "D"), ("L", "D"),
    )
    groups: Sequence[int] = (-1, -1, 3, 6)
    use_pes: Sequence[bool] = (False,) * 4
    dwc_pes: Sequence[bool] = (False,) * 4
    fixed_pes: Sequence[bool] = (False,) * 4
    no_offs: Sequence[bool] = (False,) * 4
    use_dwc_mlps: Sequence[bool] = (False,) * 4
    use_conv_patches: bool = False
    ksizes: Sequence[int] = (9, 7, 5, 3)
    layer_scale_values: Sequence[float] = (-1, -1, -1, -1)
    use_lpus: Sequence[bool] = (False,) * 4
    use_cmt_mlps: Sequence[bool] = (False,) * 4
    log_cpb: Sequence[bool] = (False,) * 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    use_checkpoint: bool = False
    kernel_impl: str = "xla"  # 'xla' | 'pallas' | 'auto' | 'gather'

    @nn.compact
    def __call__(
        self, x: jax.Array, *, deterministic: bool = True, train: bool = False
    ) -> List[jax.Array]:
        # ---- patch stem -------------------------------------------------
        if self.use_conv_patches:
            x = conv2d(
                x, self.dim_stem // 2, 3, stride=self.patch_size // 2,
                padding=1, name="stem_conv1",
            )
            x = LayerNorm2d(name="stem_ln1")(x)
            x = gelu(x)
            x = conv2d(
                x, self.dim_stem, 3, stride=self.patch_size // 2,
                padding=1, name="stem_conv2",
            )
            x = LayerNorm2d(name="stem_ln2")(x)
        else:
            x = conv2d(
                x, self.dim_stem, self.patch_size, stride=self.patch_size,
                name="stem_conv1",
            )
            x = LayerNorm2d(name="stem_ln1")(x)

        # linear drop-path schedule over all blocks (reference dat.py:225)
        total = sum(self.depths)
        dpr = [
            self.drop_path_rate * i / max(total - 1, 1) for i in range(total)
        ]

        fmap = self.img_size // self.patch_size
        outs: List[jax.Array] = []
        for i in range(4):
            # remat recomputes stage activations in backward — the
            # jax.checkpoint equivalent of the reference's per-stage
            # torch.utils.checkpoint wrapper (dat.py:161-165).
            stage_cls = (
                nn.remat(TransformerStage, static_argnums=(2, 3))
                if (self.use_checkpoint and train)
                else TransformerStage
            )
            stage = stage_cls(
                fmap_size=(fmap, fmap),
                window_size=self.window_sizes[i],
                dim_embed=self.dims[i],
                depths=self.depths[i],
                stage_spec=tuple(self.stage_spec[i]),
                n_groups=self.groups[i],
                use_pe=self.use_pes[i],
                heads=self.heads[i],
                stride=self.strides[i],
                offset_range_factor=self.offset_range_factor[i],
                dwc_pe=self.dwc_pes[i],
                no_off=self.no_offs[i],
                fixed_pe=self.fixed_pes[i],
                attn_drop=self.attn_drop_rate,
                proj_drop=self.drop_rate,
                expansion=self.expansion,
                drop=self.drop_rate,
                drop_path_rates=tuple(
                    dpr[sum(self.depths[:i]) : sum(self.depths[: i + 1])]
                ),
                use_dwc_mlp=self.use_dwc_mlps[i],
                ksize=self.ksizes[i],
                layer_scale_value=self.layer_scale_values[i],
                use_lpu=self.use_lpus[i],
                use_cmt_mlp=self.use_cmt_mlps[i],
                log_cpb=self.log_cpb[i],
                kernel_impl=self.kernel_impl,
                name=f"stage_{i}",
            )
            x = stage(x, deterministic, train)

            if i in self.out_indices:
                outs.append(LayerNorm2d(name=f"out_norm_{i}")(x))
            if i < 3:
                if self.use_conv_patches:
                    x = conv2d(
                        x, self.dims[i + 1], 3, stride=2, padding=1,
                        use_bias=False, name=f"down_conv_{i}",
                    )
                else:
                    x = conv2d(
                        x, self.dims[i + 1], 2, stride=2,
                        use_bias=False, name=f"down_conv_{i}",
                    )
                x = LayerNorm2d(name=f"down_ln_{i}")(x)
            fmap = fmap // 2
        return outs
