"""Fused X-block Pallas kernel (TPU).

The DAT++ 'X' block (reference: models/backbones/dat.py:140-144 +
models/utils/dat_blocks.py:316-348, plus the per-block LPU at
dat.py:135-138) is a chain of bandwidth-bound ops:

  x1  = x + dwconv3(x)            (LPU, optional)
  y   = dwconv_k(x1)              (k = window_size, typically 7)
  y   = LN(y)
  h   = y @ W_fc1 + b             (1x1 up-projection to 4C)
  h   = h + dwconv3(h)            (residual depthwise on the HIDDEN width)
  h   = gelu(h)                   (exact erf)
  out = h @ W_fc2 + b             (1x1 down-projection)

Run unfused, every step round-trips a (B, H, W, C) or — worse — a
(B, H, W, 4C) activation through HBM (~26 tensor round trips per block);
the model's own ablation shows this floor at ~15% of peak. This kernel
keeps the whole chain in VMEM: one read of x, one write of out, with the
depthwise convs as unrolled shifted FMAs on the VPU and the two
projections as MXU matmuls.

Spatial handling: the input is zero-padded by PAD=5 rows/cols (the
accumulated halo: 1 LPU + k//2 window + 1 hidden-dwc) on the XLA side;
inside the kernel, column taps use lane-preserving rolls (garbage wraps
land beyond the sliced-away tail) so every reshape keeps 8-aligned
sublane widths.

Forward-only: the custom VJP recomputes through a jnp composite, so
training works unchanged (and per-stage remat re-runs this kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf, |err| <= 1.5e-7 in f32.

    Mosaic has no erf primitive; at bf16 activation precision (~3e-3
    relative) this is indistinguishable from exact erf, so the GELU
    stays torch-parity 'exact' (the tanh approximation drifts ~1e-3 and
    compounds over blocks — CLAUDE.md parity trap)."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.where(x >= 0, y, -y)


def _roll_cols(x, dj):
    """Shift columns left by dj (axis 1 of a rank-3 (R, W, C) value).
    Wrapped garbage lands in the last dj columns, which callers slice or
    mask away. Implemented as slice+concat (portable across Mosaic
    versions; lowers to sublane rotates)."""
    if dj == 0:
        return x
    return jnp.concatenate([x[:, dj:], x[:, :dj]], axis=1)


def _x_block_kernel(
    xp_ref,   # (1, H + 2*PAD, Wp, C) zero-padded input, image at [PAD, PAD]
    w3_ref,   # (9, 1, C) LPU depthwise taps (zeros when with_lpu=False)
    b3_ref,   # (1, C)
    w7_ref,   # (k*k, 1, C) window-conv taps
    b7_ref,   # (1, C)
    g_ref,    # (1, C) LN scale
    be_ref,   # (1, C) LN bias
    wf1_ref,  # (C, E*C)
    bf1_ref,  # (1, E*C)
    wd_ref,   # (9, 1, E*C) hidden depthwise taps
    bd_ref,   # (1, E*C)
    wf2_ref,  # (E*C, C)
    bf2_ref,  # (1, C)
    o_ref,    # (1, TH, W, C)
    *,
    TH: int,
    W: int,
    C: int,
    E: int,
    k: int,
    with_lpu: bool,
    eps: float = 1e-5,
):
    t = pl.program_id(1)
    r0 = t * TH
    kh = k // 2
    wdt = xp_ref.dtype
    Wy = W + 8          # 8-aligned working width for y/h
    H = pl.num_programs(1) * TH
    Wp = xp_ref.shape[2]

    def _mask(v, row_off, col_off):
        """Zero v outside the image domain: v[p, q] maps to image
        (r0 + p + row_off, q + col_off). Chained zero-padded convs are
        NOT one conv over a larger padded domain — each intermediate
        (x1, h) must be re-zeroed outside the image or conv biases and
        border tails leak into the next conv's taps."""
        R, Wv = v.shape[0], v.shape[1]
        pr = jax.lax.broadcasted_iota(jnp.int32, (R, Wv, 1), 0) + (
            r0 + row_off
        )
        pc = jax.lax.broadcasted_iota(jnp.int32, (R, Wv, 1), 1) + col_off
        ok = (pr >= 0) & (pr < H) & (pc >= 0) & (pc < W)
        return jnp.where(ok, v, jnp.zeros_like(v))

    # row slabs for the LPU/center reads: x1[p] needs P rows r0+p .. +2
    rows = [xp_ref[0, pl.ds(r0 + di, TH + 2 * kh + 2), :, :] for di in range(3)]
    center = _roll_cols(rows[1], 1)
    if with_lpu:
        acc = None
        for di in range(3):
            for dj in range(3):
                term = _roll_cols(rows[di], dj) * w3_ref[di * 3 + dj]
                acc = term if acc is None else acc + term
        # mask: x1[p, q] maps to image (r0 + p - kh - 1, q - kh - 1)
        x1 = _mask(acc + b3_ref[...], -kh - 1, -kh - 1) + center
    else:
        x1 = center
    # x1: (TH + 2*kh + 2, Wp, C), image pixel (r, c) at x1[r - r0 + kh + 1? ]
    # — x1[p, q] corresponds to image (r0 + p - PAD + 1, q - PAD + 1).

    # window conv k x k -> y on (TH + 2, Wy)
    acc = None
    for di in range(k):
        for dj in range(k):
            term = _roll_cols(x1[di : di + TH + 2], dj) * w7_ref[di * k + dj]
            acc = term if acc is None else acc + term
    y = acc[:, :Wy, :] + b7_ref[...]  # (TH+2, Wy, C)

    # LayerNorm over channels, f32 stats (LayerNorm2d semantics)
    M1 = (TH + 2) * Wy
    y2 = y.reshape(M1, C).astype(jnp.float32)
    mean = jnp.mean(y2, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(y2 - mean), axis=1, keepdims=True)
    yn = (y2 - mean) * jax.lax.rsqrt(var + eps)
    yl = (yn * g_ref[...].astype(jnp.float32) + be_ref[...].astype(jnp.float32)).astype(
        wdt
    )

    # fc1 (MXU)
    h2 = jax.lax.dot_general(
        yl, wf1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h2 = (h2 + bf1_ref[...].astype(jnp.float32)).astype(wdt)
    # re-zero outside the image before the next conv (see _mask);
    # h3[i, j] maps to image (r0 + i - 1, j - 1)
    h3 = _mask(h2.reshape(TH + 2, Wy, E * C), -1, -1)

    # residual 3x3 depthwise on the hidden width
    acc = None
    for di in range(3):
        for dj in range(3):
            term = _roll_cols(h3[di : di + TH], dj) * wd_ref[di * 3 + dj]
            acc = term if acc is None else acc + term
    hc = acc + bd_ref[...] + _roll_cols(h3[1 : 1 + TH], 1)  # (TH, Wy, E*C)

    # exact-erf GELU (tanh approximation drifts vs the torch reference)
    hc32 = hc.astype(jnp.float32)
    hc = (hc32 * 0.5 * (1.0 + _erf(hc32 * (2.0 ** -0.5)))).astype(wdt)

    # fc2 (MXU)
    out2 = jax.lax.dot_general(
        hc.reshape(TH * Wy, E * C), wf2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out2 = out2 + bf2_ref[...].astype(jnp.float32)
    o_ref[0] = out2.reshape(TH, Wy, C)[:, :W, :].astype(o_ref.dtype)


def _x_tiles(H: int, W: int, C: int, E: int) -> int:
    """Row-tile height: target ~4K matmul rows, divisor of H, bounded by
    the f32 fc1 output temp ((TH+2) * (W+8) * E*C * 4B)."""
    budget = max(1, 6_000_000 // max(1, (W + 8) * E * C * 4))
    th = max(1, min(H, min(4096 // (W + 8) or 1, budget)))
    while H % th:
        th -= 1
    return th


def _composite(x, w3, b3, w7, b7, g, be, wf1, bf1, wd, bd, wf2, bf2,
               *, k, with_lpu, eps=1e-5):
    """jnp reference of the fused chain (backward path + tests). Matches
    the unfused module math (models/dat.py:99-110, layers.py ConvMlp)."""

    def dw(x_, w_, b_, kk):
        pad = kk // 2
        xp = jnp.pad(x_, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        H_, W_ = x_.shape[1], x_.shape[2]
        out = None
        for di in range(kk):
            for dj in range(kk):
                term = xp[:, di : di + H_, dj : dj + W_, :] * w_[di, dj, 0]
                out = term if out is None else out + term
        return out + b_

    if with_lpu:
        x = x + dw(x, w3, b3, 3)
    y = dw(x, w7, b7, k)
    y32 = y.astype(jnp.float32)
    mean = jnp.mean(y32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y32 - mean), axis=-1, keepdims=True)
    yn = (y32 - mean) * jax.lax.rsqrt(var + eps)
    y = (yn * g + be).astype(x.dtype)
    h = jnp.einsum("bhwc,cd->bhwd", y, wf1.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    h = h + bf1.astype(x.dtype)
    h = h + dw(h, wd.astype(x.dtype), bd.astype(x.dtype), 3)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False)
    out = jnp.einsum("bhwd,dc->bhwc", h.astype(x.dtype), wf2.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return (out + bf2).astype(x.dtype)


def _fwd_pallas(x, w3, b3, w7, b7, g, be, wf1, bf1, wd, bd, wf2, bf2,
                k, with_lpu, interpret):
    B, H, W, C = x.shape
    E = wf1.shape[1] // C
    PAD = k // 2 + 2  # LPU halo 1 + window halo + hidden-dwc halo 1
    TH = _x_tiles(H, W, C, E)
    # Padded width: the in-kernel column rolls need the working width
    # Wy = W+8 to stay clear of wrap garbage through the window conv
    # (slack k+1 columns past Wy), and W % 8 == 0 keeps it 8-aligned.
    Wp = W + -(-(2 * (k // 2) + 10) // 8) * 8
    out_dtype = x.dtype

    wdt = jnp.float32 if interpret else jnp.bfloat16
    xp = jnp.pad(
        x.astype(wdt),
        ((0, 0), (PAD, PAD), (PAD, Wp - W - PAD), (0, 0)),
    )

    def prep_dw(w, b, kk, feats):
        wr = w.reshape(kk * kk, 1, feats).astype(wdt)
        br = (jnp.zeros((1, feats), wdt) if b is None
              else b.reshape(1, feats).astype(wdt))
        return wr, br

    if with_lpu:
        w3r, b3r = prep_dw(w3, b3, 3, C)
    else:
        w3r = jnp.zeros((9, 1, C), wdt)
        b3r = jnp.zeros((1, C), wdt)
    w7r, b7r = prep_dw(w7, b7, k, C)
    wdr, bdr = prep_dw(wd, bd, 3, E * C)

    kernel = functools.partial(
        _x_block_kernel, TH=TH, W=W, C=C, E=E, k=k, with_lpu=with_lpu,
    )
    rep = lambda b, t: (0, 0, 0)  # noqa: E731  (weights resident)
    rep2 = lambda b, t: (0, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec((1, H + 2 * PAD, Wp, C), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 1, C), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((k * k, 1, C), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, E * C), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E * C), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 1, E * C), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E * C), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((E * C, C), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), rep2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, W, C), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), out_dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * (2 * E * C * C)
            + B * H * W * C * (9 + k * k + 9 * E + 14 * E),
            bytes_accessed=2 * B * H * W * C * 2
            + (2 * E * C * C) * 2 * B * (H // TH),
            transcendentals=B * H * W * E * C,
        ),
    )(
        xp,
        w3r, b3r,
        w7r, b7r,
        g.reshape(1, C).astype(wdt), be.reshape(1, C).astype(wdt),
        wf1.astype(wdt), bf1.reshape(1, E * C).astype(wdt),
        wdr, bdr,
        wf2.astype(wdt), bf2.reshape(1, C).astype(wdt),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def fused_x_block(x, w3, b3, w7, b7, g, be, wf1, bf1, wd, bd, wf2, bf2,
                  k, with_lpu, interpret=False):
    """Fused LPU + window-dwconv + LN + ConvMLP chain.

    Args are raw parameter arrays in their checkpoint layouts (conv
    kernels HWIO, dense kernels (in, out)); ``w3``/``b3`` may be None
    when ``with_lpu`` is False. Backward runs the jnp composite (same
    math, XLA-fused) with (x, params) as residuals.
    """
    return _fwd_pallas(x, w3, b3, w7, b7, g, be, wf1, bf1, wd, bd, wf2,
                       bf2, k, with_lpu, interpret)


def fused_conv_mlp(x, g, be, wf1, bf1, wd, bd, wf2, bf2,
                   interpret=False):
    """Fused LN -> fc1 -> residual dwc3 -> gelu -> fc2 (the 'D'-block MLP
    half, reference dat.py:150-153 + TransformerMLPWithConv). Same kernel
    as the X block with a k=1 identity window conv; the pre-MLP LayerNorm
    runs in-kernel. The caller applies LayerScale/DropPath/residual."""
    C = x.shape[-1]
    ones = jnp.ones((1, 1, 1, C), jnp.float32)
    zeros = jnp.zeros((C,), jnp.float32)
    return fused_x_block(
        x, None, None, ones, zeros, g, be, wf1, bf1, wd, bd, wf2, bf2,
        1, False, interpret,
    )


def _fxb_fwd(x, w3, b3, w7, b7, g, be, wf1, bf1, wd, bd, wf2, bf2,
             k, with_lpu, interpret):
    out = _fwd_pallas(x, w3, b3, w7, b7, g, be, wf1, bf1, wd, bd, wf2,
                      bf2, k, with_lpu, interpret)
    return out, (x, w3, b3, w7, b7, g, be, wf1, bf1, wd, bd, wf2, bf2)


def _fxb_bwd(k, with_lpu, interpret, residuals, grad):
    x, w3, b3, w7, b7, g, be, wf1, bf1, wd, bd, wf2, bf2 = residuals
    if not with_lpu:
        # keep differentiable args non-None for jax.vjp
        _, vjp = jax.vjp(
            lambda x_, w7_, b7_, g_, be_, wf1_, bf1_, wd_, bd_, wf2_, bf2_:
            _composite(x_, None, None, w7_, b7_, g_, be_, wf1_, bf1_, wd_,
                       bd_, wf2_, bf2_, k=k, with_lpu=False),
            x, w7, b7, g, be, wf1, bf1, wd, bd, wf2, bf2,
        )
        dx, dw7, db7, dg, dbe, dwf1, dbf1, dwd, dbd, dwf2, dbf2 = vjp(grad)
        return (dx, None, None, dw7, db7, dg, dbe, dwf1, dbf1, dwd, dbd,
                dwf2, dbf2)
    _, vjp = jax.vjp(
        lambda *a: _composite(*a, k=k, with_lpu=True),
        x, w3, b3, w7, b7, g, be, wf1, bf1, wd, bd, wf2, bf2,
    )
    return vjp(grad)


fused_x_block.defvjp(_fxb_fwd, _fxb_bwd)
