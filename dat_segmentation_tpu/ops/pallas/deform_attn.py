"""Fused deformable-attention Pallas kernel (TPU).

Fuses the 'D'-block hot loop that the reference runs as five separate
CUDA kernels (QK^T einsum, RPE-table grid_sample, bias add, softmax, AV
einsum; reference models/utils/dat_blocks.py:180-219) into ONE TPU kernel:

  for each (batch*group, query-row-tile) program:
    s      = K @ Q_tile^T                      (MXU)
    bias   = (W_y @ T_h) . W_x                 (MXU; tap weights built
                                                in-kernel from `pos` —
                                                the (HW x Ns) bias tensor
                                                never exists in HBM)
    p      = softmax(s * scale + bias)         (VPU, fp32)
    out    = p^T @ V                           (MXU)

The bilinear tap-weight trick is the same MXU factorization used by the
XLA path (ops/grid_sample.lerp_weight_matrix): the y-displacement depends
only on (query row, sample) and the x-displacement only on (query col,
sample), so the table lookup splits into two dense matmuls.

Forward-only: the public wrapper attaches a custom VJP whose backward
recomputes through the XLA composite path, so training works unchanged
while inference and the forward half of training take the fused kernel.

Covers the DAT++ production configuration (continuous RPE, attn_drop=0).
Other PE modes use the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_tile(H: int, W: int, target_m: int = 512) -> int:
    rt = max(1, target_m // W)
    while H % rt:
        rt -= 1
    return rt


def _col_tile(W: int, Ns: int, tw: int, budget_bytes: int = 6 * 2**20) -> int:
    """Largest x-block whose f32 tap-weight temporaries fit Mosaic's
    16 MB scoped-VMEM stack (accounting is conservative: elementwise
    temporaries all count)."""
    xb = W
    while xb > 8 and xb * Ns * tw * 4 > budget_bytes:
        xb //= 2
    while W % xb:
        xb -= 1
    return xb


def _lerp_taps(f, size, offset: int = 0):
    """(..., size) bilinear tap weights for taps [offset, offset+size)
    from unnormalized coords ``f``.

    In-kernel version of ops.grid_sample.lerp_weight_matrix: two one-hot
    comparisons against an iota; OOB taps get zero weight (ATen zeros
    padding).
    """
    i0 = jnp.floor(f)
    t = (f - i0)[..., None]
    i0 = i0.astype(jnp.int32)[..., None]
    taps = offset + jax.lax.broadcasted_iota(
        jnp.int32, f.shape + (size,), f.ndim
    )
    return jnp.where(taps == i0, 1.0 - t, 0.0) + jnp.where(
        taps == i0 + 1, t, 0.0
    )


def _kernel(
    pos_ref,    # (1, Ns, 2) f32, (y, x) normalized
    q_ref,      # (1, RT, XB, Cg)
    k_ref,      # (1, Ns, Cg)
    v_ref,      # (1, Ns, Cg)
    tbl_ref,    # (1, h_g, th, tw)
    o_ref,      # (1, RT, XB, Cg)
    m1_ref,     # VMEM scratch (h_g, Ns, RT, tw): row-interpolated table
    *,
    H: int,
    W: int,
    RT: int,
    XB: int,
    h_g: int,
    hc: int,
    th: int,
    tw: int,
    scale: float,
):
    Ns = pos_ref.shape[1]
    t = pl.program_id(1)
    xb = pl.program_id(2)
    wdt = q_ref.dtype  # tap weights in activation dtype (bf16 on TPU)

    py = pos_ref[0, :, 0]  # (Ns,)
    px = pos_ref[0, :, 1]

    # --- x tap weights for this column block, (Ns, XB, tw) contraction
    # layout (the x-block grid dim keeps the f32 temporaries inside
    # Mosaic's scoped-VMEM stack budget)
    xg = jax.lax.broadcasted_iota(jnp.int32, (1, XB), 1).astype(jnp.float32)
    xg = (xg + xb * XB) / max(W - 1.0, 1.0) * 2.0 - 1.0
    dx = (xg - px[:, None]) * 0.5  # (Ns, XB)
    fx = (dx + 1.0) * 0.5 * (tw - 1)
    wx = _lerp_taps(fx, tw).astype(wdt)  # (Ns, XB, tw)

    # --- y-interpolated table rows m1[h] = W_y @ T_h, cached in scratch:
    # identical for every x-block, so compute once per row tile (the x
    # grid dim iterates innermost) — recomputing per program was 4x
    # redundant bias FLOPs at stage-0 shapes.
    @pl.when(xb == 0)
    def _build_m1():
        # (Ns, RT, th) batch-first wy (Mosaic batched matmuls need the
        # batch dim in the same position on both operands)
        yg = jax.lax.broadcasted_iota(
            jnp.int32, (1, RT), 1
        ).astype(jnp.float32)
        yg2 = (yg + t * RT) / max(H - 1.0, 1.0) * 2.0 - 1.0
        dy = (yg2 - py[:, None]) * 0.5  # (Ns, RT)
        fy = (dy + 1.0) * 0.5 * (th - 1)
        wy = _lerp_taps(fy, th).astype(wdt)  # (Ns, RT, th)
        for h in range(h_g):
            m1_ref[h] = jax.lax.dot_general(
                wy, tbl_ref[0, h],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(wdt)

    k = k_ref[0]
    v = v_ref[0]

    # Per-head batched bias matmuls, then per-row 2-D attention dots.
    # Mosaic rejects lane-collapsing reshapes ((Ns, RT, XB) -> (Ns, M))
    # AND the internal flatten+reshape of multi-free-dim dot_generals when
    # XB < 128, so rows are iterated with pure 2-D matmuls (XB lanes).
    for h in range(h_g):
        k_h = k[:, h * hc : (h + 1) * hc]  # (Ns, hc)
        v_h = v[:, h * hc : (h + 1) * hc]

        # bias[n, r, x] = sum_u m1[h][n, r, u] * wx[n, x, u]  (batch over
        # n, dim 0 on both operands)
        bias = jax.lax.dot_general(
            m1_ref[h], wx,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (Ns, RT, XB)

        for r in range(RT):
            q_rh = q_ref[0, r, :, h * hc : (h + 1) * hc]  # (XB, hc)
            # s[n, x] = k_h @ q_rh^T
            s = jax.lax.dot_general(
                k_h, q_rh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Ns, XB)
            s = s * scale + bias[:, r, :]

            # softmax over Ns (axis 0), fp32
            s = s - jnp.max(s, axis=0, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=0, keepdims=True)

            # out[x, c] = p[:, x]^T @ v_h[:, c]
            out_rh = jax.lax.dot_general(
                p.astype(v_h.dtype), v_h,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (XB, hc)
            o_ref[0, r, :, h * hc : (h + 1) * hc] = out_rh.astype(
                o_ref.dtype
            )


def fused_deform_attention_fwd(
    q: jax.Array,      # (BG, H, W, Cg) grouped queries
    k: jax.Array,      # (BG, Ns, Cg)
    v: jax.Array,      # (BG, Ns, Cg)
    pos: jax.Array,    # (BG, Ns, 2) normalized (y, x) float32
    table: jax.Array,  # (g, h_g, th, tw)
    *,
    n_groups: int,
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    BG, H, W, Cg = q.shape
    Ns = k.shape[1]
    g, h_g, th, tw = table.shape
    hc = Cg // h_g
    assert BG % n_groups == 0 and g == n_groups
    XB = _col_tile(W, Ns, tw)
    RT = _row_tile(H, XB)
    grid = (BG, H // RT, W // XB)

    kernel = functools.partial(
        _kernel, H=H, W=W, RT=RT, XB=XB, h_g=h_g, hc=hc, th=th, tw=tw,
        scale=scale,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Ns, 2), lambda b, t, x: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT, XB, Cg), lambda b, t, x: (b, t, x, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ns, Cg), lambda b, t, x: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ns, Cg), lambda b, t, x: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_g, th, tw), lambda b, t, x: (b % g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RT, XB, Cg),
                               lambda b, t, x: (b, t, x, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BG, H, W, Cg), q.dtype),
        scratch_shapes=[pltpu.VMEM((h_g, Ns, RT, tw), q.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * BG * H * W * Ns * (2 * hc * h_g + tw * h_g)
            + 2 * BG * H * Ns * th * tw * h_g,
            bytes_accessed=q.size * q.dtype.itemsize * 2
            + (k.size + v.size) * k.dtype.itemsize * (H // RT),
            transcendentals=BG * H * W * Ns * h_g,
        ),
    )(pos.astype(jnp.float32), q, k, v, table)


def _xla_reference(q, k, v, pos, table, *, n_groups, scale):
    """Composite (unfused) computation used for the backward pass and for
    correctness testing. Must match the kernel semantics exactly."""
    BG, H, W, Cg = q.shape
    Ns = k.shape[1]
    g, h_g, th, tw = table.shape
    hc = Cg // h_g
    from ..grid_sample import lerp_weight_matrix

    qh = q.reshape(BG, H * W, h_g, hc)
    kh = k.reshape(BG, Ns, h_g, hc)
    vh = v.reshape(BG, Ns, h_g, hc)
    attn = jnp.einsum(
        "bmhc,bnhc->bhmn", qh, kh, preferred_element_type=jnp.float32
    ) * scale

    yg = jnp.arange(H, dtype=jnp.float32) / max(H - 1.0, 1.0) * 2.0 - 1.0
    xg = jnp.arange(W, dtype=jnp.float32) / max(W - 1.0, 1.0) * 2.0 - 1.0
    dy = (yg[None, :, None] - pos[..., 0][:, None, :]) * 0.5
    dx = (xg[None, :, None] - pos[..., 1][:, None, :]) * 0.5
    fy = (dy + 1.0) * 0.5 * (th - 1)
    fx = (dx + 1.0) * 0.5 * (tw - 1)
    wy = lerp_weight_matrix(fy, th)  # (BG, H, Ns, th)
    wx = lerp_weight_matrix(fx, tw)  # (BG, W, Ns, tw)
    wy = wy.reshape(BG // g, g, H, Ns, th)
    wx = wx.reshape(BG // g, g, W, Ns, tw)
    m1 = jnp.einsum(
        "bgynt,ghtu->bgynuh", wy, table.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    bias = jnp.einsum(
        "bgynuh,bgwnu->bghywn", m1, wx, preferred_element_type=jnp.float32
    )  # (B, g, h_g, H, W, Ns)
    attn = attn + bias.reshape(BG, h_g, H * W, Ns)
    p = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum(
        "bhmn,bnhc->bmhc", p.astype(v.dtype), vh,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(BG, H, W, Cg).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_deform_attention(q, k, v, pos, table, n_groups, scale,
                           interpret=False):
    """Fused forward; backward recomputes via the XLA composite."""
    return fused_deform_attention_fwd(
        q, k, v, pos, table, n_groups=n_groups, scale=scale,
        interpret=interpret,
    )


def _fda_fwd(q, k, v, pos, table, n_groups, scale, interpret):
    out = fused_deform_attention_fwd(
        q, k, v, pos, table, n_groups=n_groups, scale=scale,
        interpret=interpret,
    )
    return out, (q, k, v, pos, table)


def _fda_bwd(n_groups, scale, interpret, residuals, grad):
    q, k, v, pos, table = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_, pos_, tbl_: _xla_reference(
            q_, k_, v_, pos_, tbl_, n_groups=n_groups, scale=scale
        ),
        q, k, v, pos, table,
    )
    return vjp(grad)


fused_deform_attention.defvjp(_fda_fwd, _fda_bwd)
