"""Deformable multi-head attention (DAT / DAT++), TPU-native.

Re-design of the reference's ``DAttentionBaseline``
(reference: models/utils/dat_blocks.py:19-227) for NHWC layouts and XLA:

* offsets come from a small depthwise-conv net on the grouped queries;
* key/value features are bilinearly gathered at ``reference + offset``
  positions (the deformed grid), per offset group;
* multi-head attention runs between all H*W queries and the Ns sampled
  points, with one of four position-bias modes;
* everything is expressed as batched matmuls + one (optionally two)
  bilinear gathers so XLA maps it onto the MXU; a fused Pallas kernel
  (ops/pallas/deform_attn.py) replaces the attention+bias inner loop on
  TPU when ``kernel_impl='pallas'``.

Semantics parity notes (traps called out in SURVEY.md §7):
* grids are (x, y)-ordered at the sampler exactly like torch grid_sample;
  positions/offsets are (y, x)-ordered internally like the reference;
* ``offset_range_factor < 0`` (DAT++ segmentation) skips the tanh scaling
  and clamps positions to [-1, 1];
* the continuous RPE table has config-time shape (heads, 2*q_h-1, 2*q_w-1)
  where q_h/q_w come from the *configured* image size (224//4 // 2^stage),
  not the runtime feature size — sampling is in normalized displacement
  space so runtime H,W may differ freely;
* the reshape of grouped samples back to (B, Ns, C) deliberately mixes
  groups in the channel dim before proj_k/proj_v, matching the reference.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import valid_extent as _ve
from ..ops.grid_sample import grid_sample, grid_sample_points_mxu, lerp_weight_matrix
from ..ops.interpolate import avg_pool, resize_bilinear
from ..parallel.mesh import shard_hint
from .layers import conv2d, dense, LayerNorm2d, gelu, trunc_normal_init


def reference_points(Hk: int, Wk: int, dtype=jnp.float32) -> jax.Array:
    """Normalized (y, x) centers of the Hk x Wk sampling grid, in [-1, 1].

    Matches reference _get_ref_points (dat_blocks.py:108-121): linspace of
    pixel centers divided by (size - 1), i.e. slightly inset from the border.
    Returns (Hk, Wk, 2) with channel 0 = y, 1 = x.
    """
    # max(size-1, 1) guards the degenerate 1x1 grid (divides by zero in
    # the reference, which never sees 1x1 feature maps in practice)
    ys = (jnp.arange(Hk, dtype=dtype) + 0.5) / max(Hk - 1.0, 1.0) * 2.0 - 1.0
    xs = (jnp.arange(Wk, dtype=dtype) + 0.5) / max(Wk - 1.0, 1.0) * 2.0 - 1.0
    return jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1)


def query_grid(H: int, W: int, dtype=jnp.float32) -> jax.Array:
    """Normalized (y, x) query coordinates, corners at exactly +-1.

    Matches reference _get_q_grid (dat_blocks.py:123-136). (H, W, 2)."""
    ys = jnp.arange(H, dtype=dtype) / max(H - 1.0, 1.0) * 2.0 - 1.0
    xs = jnp.arange(W, dtype=dtype) / max(W - 1.0, 1.0) * 2.0 - 1.0
    return jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1)


class DeformableAttention(nn.Module):
    """One deformable attention op ('D' block core).

    Attributes mirror the reference constructor (dat_blocks.py:21-106).
    ``q_size`` is the config-time feature size used only to shape the
    learned PE tables.
    """

    dim: int
    n_heads: int
    n_groups: int
    stride: int
    ksize: int
    q_size: Tuple[int, int]
    offset_range_factor: float = -1.0
    use_pe: bool = True
    dwc_pe: bool = False
    fixed_pe: bool = False
    log_cpb: bool = False
    no_off: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    kernel_impl: str = "xla"  # 'xla' | 'pallas' | 'auto' | 'gather'

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        B, H, W, C = x.shape
        assert C == self.dim, (C, self.dim)
        heads, g = self.n_heads, self.n_groups
        hc = C // heads
        h_g = heads // g
        Cg = C // g
        scale = hc ** -0.5

        # Exact padded inference (ops/valid_extent.py): per-sample TRUE
        # feature extent. Every size-dependent quantity below — tanh
        # offset range, reference/query grids, sampler denormalization,
        # the kv softmax support — switches to the true extent so the
        # padded forward equals the exact-run math on the valid region.
        ctx = _ve.current()
        ext_q = ctx.get((H, W)) if ctx is not None else None
        exact = ext_q is not None

        q = dense(x, C, name="proj_q")

        # ---- offset network on grouped queries -------------------------
        # (B, H, W, g, Cg) -> (B*g, H, W, Cg); channel blocks per group.
        #
        # shard_hint (parallel/mesh.py): attention internals run BATCH-
        # parallel over the whole mesh. The module's (B*g, ...) folds and
        # HW/Ns-flattened tensors can't carry a spatially-sharded H, and
        # without pins GSPMD propagation picks pathological targets
        # (g- or head-sharded layouts reachable only by involuntary full
        # rematerialization — MULTICHIP_r03.json). Every hint is a no-op
        # off-mesh and on size-1 axes.
        _bp = ("data", "spatial")  # batch-parallel spec for dim 0
        q_grp = q.reshape(B, H, W, g, Cg).transpose(0, 3, 1, 2, 4)
        q_grp = shard_hint(q_grp.reshape(B * g, H, W, Cg), _bp)
        pad = self.ksize // 2 if self.ksize != self.stride else 0
        off = conv2d(
            q_grp, Cg, self.ksize, stride=self.stride, padding=pad,
            groups=Cg, name="offset_dwc",
        )
        off = LayerNorm2d(name="offset_ln")(off)
        off = shard_hint(gelu(off), _bp)
        offset = dense(off, 2, use_bias=False, name="offset_proj")
        Hk, Wk = offset.shape[1], offset.shape[2]
        Ns = Hk * Wk

        ext_kv = kv_mask = None
        if exact:
            # true kv grid size per sample: the offset conv's own shape
            # arithmetic (avg_pool floor(e/s) for no_off)
            if self.no_off:
                ext_kv = ext_q // self.stride
            else:
                ext_kv = _ve.conv_out_extent(
                    ext_q, self.ksize, self.stride, pad
                )
            kv_mask = _ve.mask_for((Hk, Wk), ext_kv, jnp.bool_).reshape(
                B, Ns
            )  # (B, Ns) valid kv points

        offset = offset.astype(jnp.float32)
        if self.offset_range_factor >= 0 and not self.no_off:
            if exact:
                rng = 1.0 / jnp.maximum(
                    ext_kv.astype(jnp.float32) - 1.0, 1.0
                )  # (B, 2)
                rng = jnp.repeat(rng, g, axis=0)[:, None, None, :]
            else:
                rng = jnp.array(
                    [1.0 / (Hk - 1.0), 1.0 / (Wk - 1.0)], dtype=jnp.float32
                )
            offset = jnp.tanh(offset) * rng * self.offset_range_factor
        if self.no_off:
            offset = jnp.zeros_like(offset)

        if exact:
            # per-sample reference grid over the TRUE kv extent
            # (same pixel-center formula as reference_points)
            hk = jnp.maximum(ext_kv[:, 0].astype(jnp.float32) - 1.0, 1.0)
            wk = jnp.maximum(ext_kv[:, 1].astype(jnp.float32) - 1.0, 1.0)
            ys = (
                (jnp.arange(Hk, dtype=jnp.float32) + 0.5)[None, :]
                / hk[:, None] * 2.0 - 1.0
            )  # (B, Hk)
            xs = (
                (jnp.arange(Wk, dtype=jnp.float32) + 0.5)[None, :]
                / wk[:, None] * 2.0 - 1.0
            )  # (B, Wk)
            ref = jnp.stack(
                [
                    jnp.broadcast_to(ys[:, :, None], (B, Hk, Wk)),
                    jnp.broadcast_to(xs[:, None, :], (B, Hk, Wk)),
                ],
                axis=-1,
            )
            ref = jnp.repeat(ref, g, axis=0)  # (B*g, Hk, Wk, 2)
        else:
            ref = reference_points(Hk, Wk)  # (Hk, Wk, 2), (y, x)
        pos = offset + ref  # broadcast over B*g
        if self.offset_range_factor < 0:
            pos = jnp.clip(pos, -1.0, 1.0)
        pos = shard_hint(pos.reshape(B * g, Ns, 2), _bp)

        # ---- deformed sampling -----------------------------------------
        # In exact mode positions are normalized over the TRUE extent but
        # the samplers denormalize over the PADDED map, so rescale:
        # (pos+1)/2*(ext-1) pixels == (pos_s+1)/2*(H-1) pixels. The map is
        # masked to zero beyond the true extent first, so taps falling
        # between the true and padded borders read the zeros the exact
        # run's zeros-padding would produce.
        pos_s = pos
        if exact:
            sc = (ext_q.astype(jnp.float32) - 1.0) / jnp.array(
                [max(H - 1.0, 1.0), max(W - 1.0, 1.0)], jnp.float32
            )  # (B, 2)
            pos_s = (pos + 1.0) * jnp.repeat(sc, g, axis=0)[:, None, :] - 1.0
        if self.no_off:
            assert H % self.stride == 0 and W % self.stride == 0
            x_p = _ve.mask_tensor(x, ext_q) if exact else x
            sampled = avg_pool(x_p, self.stride, self.stride)  # (B, Hk, Wk, C)
            sampled = sampled.reshape(B, Ns, C)
        else:
            x_p = _ve.mask_tensor(x, ext_q) if exact else x
            x_grp = x_p.reshape(B, H, W, g, Cg).transpose(0, 3, 1, 2, 4)
            x_grp = x_grp.reshape(B * g, H, W, Cg)
            if self.kernel_impl == "gather":
                grid = pos_s[..., ::-1].reshape(B * g, Hk, Wk, 2)  # (x, y)
                samp = grid_sample(x_grp, grid, align_corners=True)
                samp = samp.reshape(B, g, Ns, Cg)
            else:
                # MXU path: bilinear gather as S_y @ x @ S_x^T matmuls
                samp = grid_sample_points_mxu(x_grp, pos_s)
                samp = samp.reshape(B, g, Ns, Cg)
            # (B, g, Ns, Cg) -> (B, Ns, C); groups fold back into channels
            sampled = samp.transpose(0, 2, 1, 3).reshape(B, Ns, C)
        sampled = shard_hint(sampled, _bp)

        k = dense(sampled, C, name="proj_k")
        v = dense(sampled, C, name="proj_v")

        # 'auto': the v2 fused kernel (full-row x-blocks, 64MB VMEM
        # budget) beats the XLA composite at every DAT-T++ stage on v5e
        # (2.35x at stage-0 128x128), so on TPU it is used unconditionally.
        impl = self.kernel_impl
        if impl == "auto":
            # DAT_TPU_KERNEL overrides the auto choice ('xla'|'pallas') —
            # the escape hatch benches use to fall back if a Pallas path
            # fails Mosaic compilation on a new backend revision.
            impl = os.environ.get("DAT_TPU_KERNEL", "") or (
                "pallas" if jax.default_backend() == "tpu" else "xla"
            )
        use_pallas = (
            impl == "pallas"
            and self.use_pe
            and not (self.dwc_pe or self.fixed_pe or self.log_cpb)
            and not self.no_off
            and (self.attn_drop == 0.0 or deterministic)
            # exact padded inference needs per-sample sizes inside the
            # kernel; route through the (maskable) XLA composite instead
            and not exact
        )
        if use_pallas:
            from ..ops.pallas.deform_attn import fused_deform_attention

            th = self.q_size[0] * 2 - 1
            tw = self.q_size[1] * 2 - 1
            table = self.param(
                "rpe_table", trunc_normal_init(0.01), (heads, th, tw)
            )
            q_g = q.reshape(B, H, W, g, Cg).transpose(0, 3, 1, 2, 4)
            q_g = q_g.reshape(B * g, H, W, Cg)
            # Mosaic's (RT, W, C) <-> (RT*W, C) shape casts need
            # sublane-aligned spatial dims; 224-input stages (28/14/7)
            # have none, so queries are zero-padded up to the next
            # 8-multiple. Each query attends over the same Ns samples
            # independently, so padded rows just produce garbage output
            # that the slice below discards (their cotangents are zero in
            # backward); the kernel normalizes coordinates by the TRUE
            # H/W passed as hn/wn.
            Hp, Wp = -(-H // 8) * 8, -(-W // 8) * 8
            hn = wn = 0
            if (Hp, Wp) != (H, W):
                q_g = jnp.pad(
                    q_g, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0))
                )
                hn, wn = H, W
            k_g = k.reshape(B, Ns, g, Cg).transpose(0, 2, 1, 3)
            k_g = k_g.reshape(B * g, Ns, Cg)
            v_g = v.reshape(B, Ns, g, Cg).transpose(0, 2, 1, 3)
            v_g = v_g.reshape(B * g, Ns, Cg)
            interpret = jax.default_backend() != "tpu"
            # kernel version: 0 = auto (v3 large-M where W >= 128, v4
            # query-major at narrow stages) — 214.8 vs v2's 182.3 img/s
            # at b8 on v5e. Env hooks kept for experiments.
            version = int(os.environ.get("DAT_TPU_KERNEL_VERSION", "0"))
            fused_bwd = os.environ.get("DAT_TPU_FUSED_BWD", "1") != "0"
            out = fused_deform_attention(
                q_g, k_g, v_g, pos,
                table.reshape(g, h_g, th, tw),
                g, scale, interpret, version, fused_bwd, hn, wn,
            )
            out = out[:, :H, :W]
            out = out.reshape(B, g, H, W, Cg).transpose(0, 2, 3, 1, 4)
            out = out.reshape(B, H, W, C)
            y = dense(out, C, name="proj_out")
            return nn.Dropout(self.proj_drop, deterministic=deterministic)(y)

        qh = shard_hint(q.reshape(B, H * W, heads, hc), _bp)
        kh = shard_hint(k.reshape(B, Ns, heads, hc), _bp)
        vh = shard_hint(v.reshape(B, Ns, heads, hc), _bp)

        attn = jnp.einsum(
            "bmhc,bnhc->bhmn", qh, kh, preferred_element_type=jnp.float32
        )
        attn = shard_hint(attn * scale, _bp)

        def _qgrid_ps():
            # per-sample query grid rows/cols over the TRUE query extent
            # (exact mode; same corner formula as query_grid)
            hq = jnp.maximum(ext_q[:, 0].astype(jnp.float32) - 1.0, 1.0)
            wq = jnp.maximum(ext_q[:, 1].astype(jnp.float32) - 1.0, 1.0)
            qy = (
                jnp.arange(H, dtype=jnp.float32)[None, :] / hq[:, None]
                * 2.0 - 1.0
            )
            qx = (
                jnp.arange(W, dtype=jnp.float32)[None, :] / wq[:, None]
                * 2.0 - 1.0
            )
            return jnp.repeat(qy, g, axis=0), jnp.repeat(qx, g, axis=0)

        lepe = None
        if self.use_pe and not self.no_off:
            if self.dwc_pe:
                lepe = conv2d(q, C, 3, padding=1, groups=C, name="rpe_dwc")
            elif self.fixed_pe:
                kv_h = self.q_size[0] // self.stride
                kv_w = self.q_size[1] // self.stride
                q_hw = self.q_size[0] * self.q_size[1]
                kv_hw = kv_h * kv_w
                table = self.param(
                    "rpe_table",
                    trunc_normal_init(0.01),
                    (heads, q_hw, kv_hw),
                )
                if exact:
                    # The reference resizes the (q_hw, kv_hw) table to the
                    # runtime (H*W, Ns) with a 2-D align-corners bilinear
                    # interpolate (dat_blocks.py:187-191) — separable over
                    # the two FLAT row-major axes. In the exact run those
                    # axes have per-sample lengths eh*ew and ekh*ekw, so
                    # express each 1-D interp as a per-sample tap-weight
                    # matmul: padded query (y, x) maps to exact flat index
                    # y*ew + x, scaled by (q_hw-1)/(eh*ew-1). Invalid
                    # queries alias valid rows (garbage the downstream
                    # masking discards); invalid kv columns are removed
                    # from the softmax by kv_mask.
                    dt = x.dtype
                    ehf = ext_q[:, 0].astype(jnp.float32)
                    ewf = ext_q[:, 1].astype(jnp.float32)
                    yy = jnp.arange(H, dtype=jnp.float32)
                    xx = jnp.arange(W, dtype=jnp.float32)
                    flat_q = (
                        yy[None, :, None] * ewf[:, None, None]
                        + xx[None, None, :]
                    ).reshape(B, H * W)
                    u = flat_q * (q_hw - 1.0) / jnp.maximum(
                        ehf * ewf - 1.0, 1.0
                    )[:, None]
                    w1 = lerp_weight_matrix(u, q_hw, dt)  # (B, HW, q_hw)
                    ekhf = ext_kv[:, 0].astype(jnp.float32)
                    ekwf = ext_kv[:, 1].astype(jnp.float32)
                    kyy = jnp.arange(Hk, dtype=jnp.float32)
                    kxx = jnp.arange(Wk, dtype=jnp.float32)
                    flat_k = (
                        kyy[None, :, None] * ekwf[:, None, None]
                        + kxx[None, None, :]
                    ).reshape(B, Ns)
                    vv = flat_k * (kv_hw - 1.0) / jnp.maximum(
                        ekhf * ekwf - 1.0, 1.0
                    )[:, None]
                    w2 = lerp_weight_matrix(vv, kv_hw, dt)  # (B, Ns, kv_hw)
                    m1 = jnp.einsum(
                        "bmp,hpq->bhmq", w1, table.astype(dt),
                        preferred_element_type=jnp.float32,
                    ).astype(dt)
                    bias = jnp.einsum(
                        "bhmq,bnq->bhmn", m1, w2,
                        preferred_element_type=jnp.float32,
                    )
                else:
                    bias = resize_bilinear(
                        table[None].transpose(0, 2, 3, 1),
                        (H * W, Ns),
                        align_corners=True,
                    ).transpose(0, 3, 1, 2)  # (1, heads, HW, Ns)
                attn = attn + bias.astype(attn.dtype)
            elif self.log_cpb:
                if exact:
                    qy, qx = _qgrid_ps()
                    qg = jnp.stack(
                        [
                            jnp.broadcast_to(qy[:, :, None], (B * g, H, W)),
                            jnp.broadcast_to(qx[:, None, :], (B * g, H, W)),
                        ],
                        axis=-1,
                    ).reshape(B * g, H * W, 2)
                else:
                    qg = query_grid(H, W).reshape(1, H * W, 2)
                    qg = jnp.broadcast_to(qg, (B * g, H * W, 2))
                disp = qg[:, :, None, :] - pos[:, None, :, :]
                disp = disp * 4.0
                disp = (
                    jnp.sign(disp)
                    * jnp.log2(jnp.abs(disp) + 1.0)
                    / np.log2(8.0)
                )
                hb = dense(disp, 32, name="cpb_fc1")
                hb = nn.relu(hb)
                bias = dense(hb, h_g, use_bias=False, name="cpb_fc2")
                # (B*g, HW, Ns, h_g) -> (B, heads, HW, Ns)
                bias = bias.reshape(B, g, H * W, Ns, h_g)
                bias = bias.transpose(0, 1, 4, 2, 3).reshape(
                    B, heads, H * W, Ns
                )
                attn = attn + bias.astype(attn.dtype)
            else:
                # continuous RPE: bilinearly sample a learned per-head
                # (2*q_h-1, 2*q_w-1) table at 0.5 * (query - sample)
                # displacements (reference dat_blocks.py:198-214)
                th = self.q_size[0] * 2 - 1
                tw = self.q_size[1] * 2 - 1
                table = self.param(
                    "rpe_table", trunc_normal_init(0.01), (heads, th, tw)
                )
                if self.kernel_impl == "gather":
                    if exact:
                        qy, qx = _qgrid_ps()
                        qg = jnp.stack(
                            [
                                jnp.broadcast_to(
                                    qy[:, :, None], (B * g, H, W)
                                ),
                                jnp.broadcast_to(
                                    qx[:, None, :], (B * g, H, W)
                                ),
                            ],
                            axis=-1,
                        ).reshape(B * g, H * W, 2)
                    else:
                        qg = query_grid(H, W).reshape(1, H * W, 2)
                        qg = jnp.broadcast_to(qg, (B * g, H * W, 2))
                    disp = (qg[:, :, None, :] - pos[:, None, :, :]) * 0.5
                    tbl = table.reshape(g, h_g, th, tw).transpose(0, 2, 3, 1)
                    tbl = jnp.broadcast_to(tbl[None], (B, g, th, tw, h_g))
                    tbl = tbl.reshape(B * g, th, tw, h_g)
                    bias = grid_sample(
                        tbl, disp[..., ::-1], align_corners=True
                    )  # (B*g, HW, Ns, h_g)
                    bias = bias.reshape(B, g, H * W, Ns, h_g)
                    bias = bias.transpose(0, 1, 4, 2, 3).reshape(
                        B, heads, H * W, Ns
                    )
                else:
                    # MXU path: the displacement separates — dy depends on
                    # (query row, sample) and dx on (query col, sample) —
                    # so the bilinear table lookup factorizes into two
                    # dense matmuls over (th,)/(tw,) tap weights and never
                    # materializes (HW x Ns) coordinates.
                    if exact:
                        qy, qx = _qgrid_ps()  # (B*g, H), (B*g, W)
                    else:
                        qg2 = query_grid(H, W)  # (H, W, 2)
                        qy = qg2[:, 0, 0][None, :]  # (1, H)
                        qx = qg2[0, :, 1][None, :]  # (1, W)
                    dy = (
                        qy[:, :, None] - pos[..., 0][:, None, :]
                    ) * 0.5  # (B*g, H, Ns)
                    dx = (
                        qx[:, :, None] - pos[..., 1][:, None, :]
                    ) * 0.5  # (B*g, W, Ns)
                    fy = (dy + 1.0) * 0.5 * (th - 1)
                    fx = (dx + 1.0) * 0.5 * (tw - 1)
                    dt = x.dtype
                    # pin the (B*g, ..) -> (B, g, ..) folds to a plain
                    # batch layout: on dp x sp meshes GSPMD's propagation
                    # otherwise targets a g-sharded layout it can only
                    # reach by involuntary full rematerialization
                    # (parallel/mesh.py:shard_hint; no-op off-mesh)
                    wy = shard_hint(
                        lerp_weight_matrix(fy, th, dt).reshape(
                            B, g, H, Ns, th
                        ),
                        _bp,
                    )
                    wx = shard_hint(
                        lerp_weight_matrix(fx, tw, dt).reshape(
                            B, g, W, Ns, tw
                        ),
                        _bp,
                    )
                    tblg = table.reshape(g, h_g, th, tw).astype(dt)
                    m1 = jnp.einsum(
                        "bgynt,ghtu->bgynuh", wy, tblg,
                        preferred_element_type=jnp.float32,
                    ).astype(dt)  # (B, g, H, Ns, tw, h_g)
                    bias = jnp.einsum(
                        "bgynuh,bgwnu->bghywn", m1, wx,
                        preferred_element_type=jnp.float32,
                    )  # (B, g, h_g, H, W, Ns)
                    bias = shard_hint(
                        bias.reshape(B, heads, H * W, Ns), _bp
                    )
                attn = attn + bias.astype(attn.dtype)

        if exact:
            # kv points beyond the true grid don't exist in the exact
            # run — remove them from the softmax support
            attn = jnp.where(
                kv_mask[:, None, None, :],
                attn,
                jnp.asarray(-1e30, attn.dtype),
            )
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = shard_hint(attn, _bp)
        attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)

        out = jnp.einsum(
            "bhmn,bnhc->bmhc", attn, vh, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = shard_hint(out.reshape(B, H, W, C), _bp)
        if lepe is not None:
            out = out + lepe
        y = dense(out, C, name="proj_out")
        y = nn.Dropout(self.proj_drop, deterministic=deterministic)(y)
        return y
