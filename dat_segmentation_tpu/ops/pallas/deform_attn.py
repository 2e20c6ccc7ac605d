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
import os
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


def _packed_taps(fy, pack: int, size: int, deriv: bool = False):
    """Block-diagonal packed tap rows (M/pack, pack*size) from (Ns, RT)
    coords, built group-by-group with Mosaic-legal shape casts only.

    Group j's rows are its coords shifted into K-block j (taps
    [j*size, (j+1)*size)) so one (NsG*RT, pack*size) matmul against a
    block-diagonal table computes every group at once with pack x fewer
    M rows. Two legality constraints shape the construction:

    * Each group is carved out with a SUBLANE slice fy[j*NsG:(j+1)*NsG]
      and collapsed with the known-good (NsG, RT, t)->(NsG*RT, t) cast.
      The one-shot fy.reshape(pack, NsG*RT) form is a lane-changing
      reshape Mosaic rejects ("unsupported shape cast" (256, 32) ->
      (2, 4096) on v5e).
    * Taps are CONFINED to each group's own K-block. For a local coord
      OUTSIDE [0, size-1] (legal — ``pos`` is unclamped for
      offset_range_factor >= 0, and reference_points itself exceeds the
      grid at the borders), ``_lerp_taps`` would deposit zeros-padding
      weight into the NEIGHBORING group's block (local f = -0.3 puts
      0.3 at global tap j*size - 1, the previous group's last row). The
      unpacked build drops those taps (no row exists); masking each
      group to its own block reproduces that exactly.

    With ``deriv`` also returns the packed d(tap)/d(coord) rows (the
    -1/+1 one-hot subgradient pair), confined the same way.
    """
    Ns, RT = fy.shape
    NsG = Ns // pack
    blk = (
        jax.lax.broadcasted_iota(jnp.int32, (NsG * RT, pack * size), 1)
        // size
    )
    wy = jnp.zeros((NsG * RT, pack * size), jnp.float32)
    dt = jnp.zeros((NsG * RT, pack * size), jnp.float32) if deriv else None
    for j in range(pack):
        fy_j = fy[j * NsG : (j + 1) * NsG] + j * size  # (NsG, RT) sublanes
        w_j = _lerp_taps(fy_j, pack * size).reshape(NsG * RT, pack * size)
        wy = wy + jnp.where(blk == j, w_j, 0.0)
        if deriv:
            i0 = jnp.floor(fy_j).astype(jnp.int32)[..., None]
            taps = jax.lax.broadcasted_iota(
                jnp.int32, (NsG, RT, pack * size), 2
            )
            d_j = (
                jnp.where(taps == i0 + 1, 1.0, 0.0)
                - jnp.where(taps == i0, 1.0, 0.0)
            ).reshape(NsG * RT, pack * size)
            dt = dt + jnp.where(blk == j, d_j, 0.0)
    return (wy, dt) if deriv else wy


def _m1_pack(Ns: int, th: int, tw: int, h_g: int) -> int:
    """Sample-group packing factor G for the m1 tap matmul.

    The m1 build (Ns*RT, th) @ (th, h_g*tw) is M-row-rate bound with
    th, h_g*tw ≪ 128 lanes at the narrow stages. Packing G sample
    groups block-diagonally multiplies K and N by G while dividing M by
    G; the tile-count model predicts a G/(K-passes * N-passes) win.

    Measured on real v5e (2026-08-18, tools/bench_block.py B=4): the
    model is wrong there — packed vs unpacked fwd ms/block is 0.934 vs
    0.956 at stage 1 (G=1, noise), 0.747 vs 0.696 at stage 2 (G=2,
    -7%), 0.788 vs 0.664 at stage 3 (G=4, -19%); fwd+bwd mirrors it
    (1.756 vs 1.493 at stage 3). The extra VPU work building block-diag
    masks + the wider (pack*size) lane tiles cost more than the saved
    M-passes, so the default is UNPACKED; DAT_TPU_M1PACK opts back in
    for future re-tuning on other TPU generations.
    """
    del th, tw, h_g  # only the override path needs shape info now
    forced = os.environ.get("DAT_TPU_M1PACK", "")
    if forced:
        f = int(forced)
        return f if f >= 1 and Ns % f == 0 else 1
    return 1


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


def _kernel_v2(
    pos_ref,    # (1, Ns, 2) f32, (y, x) normalized
    q_ref,      # (1, RT, W, Cg)
    k_ref,      # (1, Ns, Cg)
    v_ref,      # (1, Ns, Cg)
    tbl_ref,    # (1, h_g, th, tw)
    o_ref,      # (1, RT, W, Cg)
    wx_ref,     # VMEM scratch (Ns, W, tw): x tap weights (per bg)
    m1_ref,     # VMEM scratch (h_g, Ns, RT, tw): row-interpolated table
    *,
    H: int,
    W: int,
    RT: int,
    XC: int,
    h_g: int,
    hc: int,
    th: int,
    tw: int,
    scale: float,
    Hn: int,  # TRUE (unpadded) sizes for coordinate normalization —
    Wn: int,  # H/W may be zero-padded up to sublane multiples (28->32 &c)
    nobias: bool = False,  # debug: skip the RPE-bias path entirely
):
    """Full-row-width kernel: every matmul keeps >=W lanes busy.

    Layout rationale (v5e): the v1 kernel's per-sample bias dots ran
    (RT x tw)@(tw x XB) with XB capped at 32 by the scoped-VMEM budget —
    ~3% MXU utilization, which made the fused kernel LOSE to XLA at
    stage 0. Here the x tap weights are built in fori_loop chunks (Mosaic
    charges the f32 temporaries of a fori body once, not per chunk), so
    the x-block spans the whole row (XB = W) and the bias dot runs
    (RT x tw)@(tw x W); the y-interp collapses (Ns, RT) into one
    (Ns*RT x th)@(th x tw) matmul.
    """
    Ns = pos_ref.shape[1]
    t = pl.program_id(1)
    wdt = q_ref.dtype

    py = pos_ref[0, :, 0]  # (Ns,)
    px = pos_ref[0, :, 1]

    # --- x tap weights: per bg (same for every row tile), chunked builds
    @pl.when(t == 0)
    def _build_wx():
        def body(i, carry):
            xg = (
                jax.lax.broadcasted_iota(jnp.int32, (1, XC), 1) + i * XC
            ).astype(jnp.float32)
            xg = xg / max(Wn - 1.0, 1.0) * 2.0 - 1.0
            dx = (xg - px[:, None]) * 0.5  # (Ns, XC)
            fx = (dx + 1.0) * 0.5 * (tw - 1)
            wx_ref[:, pl.ds(i * XC, XC), :] = _lerp_taps(fx, tw).astype(wdt)
            return carry

        if not nobias:
            jax.lax.fori_loop(0, W // XC, body, 0)

    # --- y-interpolated table rows, one big-M matmul per head
    yg = jax.lax.broadcasted_iota(jnp.int32, (1, RT), 1).astype(jnp.float32)
    yg = (yg + t * RT) / max(Hn - 1.0, 1.0) * 2.0 - 1.0
    dy = (yg - py[:, None]) * 0.5  # (Ns, RT)
    fy = (dy + 1.0) * 0.5 * (th - 1)
    wy = _lerp_taps(fy, th).astype(wdt).reshape(Ns * RT, th)
    if not nobias:
        for h in range(h_g):
            m1 = jax.lax.dot_general(
                wy, tbl_ref[0, h].astype(wdt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Ns*RT, tw)
            m1_ref[h] = m1.astype(wdt).reshape(Ns, RT, tw)

    k = k_ref[0]
    v = v_ref[0]
    for h in range(h_g):
        k_h = k[:, h * hc : (h + 1) * hc]  # (Ns, hc)
        v_h = v[:, h * hc : (h + 1) * hc]

        if nobias:
            bias = None
        else:
            # bias[n, r, x] = sum_u m1[h][n, r, u] * wx[n, x, u]
            bias = jax.lax.dot_general(
                m1_ref[h], wx_ref[...],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (Ns, RT, W)

        for r in range(RT):
            q_rh = q_ref[0, r, :, h * hc : (h + 1) * hc]  # (W, hc)
            s = jax.lax.dot_general(
                k_h, q_rh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Ns, W)
            s = s * scale + (0.0 if nobias else bias[:, r, :])

            # softmax over Ns (axis 0), fp32
            s = s - jnp.max(s, axis=0, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=0, keepdims=True)

            out_rh = jax.lax.dot_general(
                p.astype(v_h.dtype), v_h,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (W, hc)
            o_ref[0, r, :, h * hc : (h + 1) * hc] = out_rh.astype(o_ref.dtype)


def _kernel_v3(
    pos_ref,    # (1, Ns, 2) f32, (y, x) normalized
    q_ref,      # (1, RT, W, Cg)
    k_ref,      # (1, Ns, Cg)
    v_ref,      # (1, Ns, Cg)
    tbl_ref,    # (1, h_g, th, tw)
    o_ref,      # (1, RT, W, Cg)
    wx_ref,     # VMEM scratch (Ns, W, tw)
    m1_ref,     # VMEM scratch (Ns, h_g*RT, tw): heads folded into rows
    *,
    H: int,
    W: int,
    RT: int,
    XC: int,
    h_g: int,
    hc: int,
    th: int,
    tw: int,
    scale: float,
    Hn: int,
    Wn: int,
    nobias: bool = False,
):
    """Large-M variant for W >= 128 stages.

    Two structural fixes over v2 (ablation-driven: the bias apply was 36%
    of the b8 forward at ~3.4 TF/s because each per-sample batched matmul
    ran with M = RT = 16 rows — 12.5% MXU row utilization):
    * heads fold into the M dimension of ONE batched bias matmul,
      (Ns) x (h_g*RT, tw) @ (tw, W), so M = h_g*RT = 128 at stage 0;
    * QK / AV run as multi-free-dim dot_generals over the whole (RT, W)
      tile (legal when W fills the 128 lanes) instead of RT unrolled
      2-D dots.
    """
    Ns = pos_ref.shape[1]
    t = pl.program_id(1)
    wdt = q_ref.dtype

    py = pos_ref[0, :, 0]
    px = pos_ref[0, :, 1]

    if not nobias:
        @pl.when(t == 0)
        def _build_wx():
            def body(i, carry):
                xg = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, XC), 1) + i * XC
                ).astype(jnp.float32)
                xg = xg / max(Wn - 1.0, 1.0) * 2.0 - 1.0
                dx = (xg - px[:, None]) * 0.5
                fx = (dx + 1.0) * 0.5 * (tw - 1)
                wx_ref[:, pl.ds(i * XC, XC), :] = _lerp_taps(fx, tw).astype(
                    wdt
                )
                return carry

            jax.lax.fori_loop(0, W // XC, body, 0)

        yg = jax.lax.broadcasted_iota(
            jnp.int32, (1, RT), 1
        ).astype(jnp.float32)
        yg = (yg + t * RT) / max(Hn - 1.0, 1.0) * 2.0 - 1.0
        dy = (yg - py[:, None]) * 0.5
        fy = (dy + 1.0) * 0.5 * (th - 1)
        wy = _lerp_taps(fy, th).astype(wdt).reshape(Ns * RT, th)
        for h in range(h_g):
            m1 = jax.lax.dot_general(
                wy, tbl_ref[0, h].astype(wdt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m1_ref[:, h * RT : (h + 1) * RT, :] = m1.astype(wdt).reshape(
                Ns, RT, tw
            )

        # ONE batched bias matmul for every head: (Ns, h_g*RT, W)
        bias_all = jax.lax.dot_general(
            m1_ref[...], wx_ref[...],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    k = k_ref[0]
    v = v_ref[0]
    qb = q_ref[0]  # (RT, W, Cg)
    for h in range(h_g):
        k_h = k[:, h * hc : (h + 1) * hc]
        v_h = v[:, h * hc : (h + 1) * hc]
        q_h = qb[:, :, h * hc : (h + 1) * hc]  # (RT, W, hc)

        # s[n, r, x] = sum_c k[n, c] q[r, x, c]
        s = jax.lax.dot_general(
            k_h, q_h,
            dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Ns, RT, W)
        s = s * scale
        if not nobias:
            s = s + bias_all[:, h * RT : (h + 1) * RT, :]
        s = s - jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=0, keepdims=True)

        # out[r, x, c] = sum_n p[n, r, x] v[n, c]
        out_h = jax.lax.dot_general(
            p.astype(v_h.dtype), v_h,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (RT, W, hc)
        o_ref[0, :, :, h * hc : (h + 1) * hc] = out_h.astype(o_ref.dtype)


def _v3_tiles(H: int, W: int, Ns: int, tw: int, h_g: int = 1):
    """(RT, XC) for the v3 kernel. RT targets h_g*RT = 128 (full MXU rows
    in the folded bias matmul), bounded by the f32 (Ns, h_g*RT, W)
    bias/s/p temporaries (~16 MB each)."""
    hr = max(1, min(128, 16_000_000 // max(1, Ns * W * 4)))
    rt = max(1, min(H, hr // max(h_g, 1)))
    while H % rt:
        rt -= 1
    xc = max(8, min(W, 2_000_000 // (Ns * max(tw, 1) * 4)))
    while W % xc:
        xc -= 1
    return rt, xc


def _kernel_v4(
    pos_ref,    # (1, Ns, 2) f32, (y, x) normalized
    q_ref,      # (1, RT, W, Cg)
    k_ref,      # (1, Ns, Cg)
    v_ref,      # (1, Ns, Cg)
    tbl_ref,    # (1, h_g, th, tw)
    o_ref,      # (1, RT, W, Cg)
    wx_ref,     # VMEM scratch (Ns/pack, pack*W, pack*tw): block-diag
                # x-tap weights — group j's (W, tw) block sits at rows
                # [j*W:(j+1)*W), lanes [j*tw:(j+1)*tw)
    m1_ref,     # VMEM scratch (Ns/pack, h_g*RT, pack*tw): group-packed
                # row-interpolated table (lanes (j, u) per head-row block)
    tall_ref,   # VMEM scratch (pack*th, pack*h_g*tw): block-diag table,
                # heads side-by-side in lanes within each diagonal block
    *,
    H: int,
    W: int,
    RT: int,
    XC: int,
    h_g: int,
    hc: int,
    th: int,
    tw: int,
    scale: float,
    Hn: int,
    Wn: int,
    nobias: bool = False,
    pack: int = 1,
):
    """Query-major kernel for narrow-W stages.

    At stages with W < 128 every (.., W)-lane matmul of the v2 kernel
    wastes 50-87% of the MXU columns. Here queries live in ROWS and the
    Ns sampled points in LANES (Ns = 256 = 2 full lane groups at every
    DAT stage): s2 = Q2 (RT*W, hc) @ K^T and out = P2 @ V are single
    full-lane matmuls, and softmax reduces along lanes. The bias is
    computed sample-major (heads folded, as v3) and enters via RT cheap
    (Ns, W) -> (W, Ns) 2-D transposes.

    `pack` = G > 1 additionally splits the Ns samples into G groups and
    runs BOTH bias matmuls block-diagonally: the m1 tap build against a
    block-diag table with G-fewer M rows, and the per-sample batched
    bias matmul against block-diag x-tap weights with G-fewer batch
    elements (G*W lanes each) — the two ops are M-row/batch-rate bound
    at th, tw, W ≪ 128, so each is ~G x cheaper.
    """
    Ns = pos_ref.shape[1]
    NsG = Ns // pack
    t = pl.program_id(1)
    wdt = q_ref.dtype

    py = pos_ref[0, :, 0]
    px = pos_ref[0, :, 1]

    if not nobias:
        @pl.when(t == 0)
        def _build_wx():
            if pack > 1:
                wx_ref[...] = jnp.zeros(wx_ref.shape, wdt)

            def body(i, carry):
                xg = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, XC), 1) + i * XC
                ).astype(jnp.float32)
                xg = xg / max(Wn - 1.0, 1.0) * 2.0 - 1.0
                dx = (xg - px[:, None]) * 0.5
                fx = (dx + 1.0) * 0.5 * (tw - 1)
                w = _lerp_taps(fx, tw).astype(wdt)  # (Ns, XC, tw)
                for j in range(pack):
                    wx_ref[
                        :,
                        pl.ds(j * W + i * XC, XC),
                        j * tw : (j + 1) * tw,
                    ] = w[j * NsG : (j + 1) * NsG]
                return carry

            jax.lax.fori_loop(0, W // XC, body, 0)

        @pl.when(t == 0)
        def _build_tall():
            if pack > 1:
                tall_ref[...] = jnp.zeros(tall_ref.shape, wdt)
            for j in range(pack):
                for h in range(h_g):
                    tall_ref[
                        j * th : (j + 1) * th,
                        j * h_g * tw + h * tw : j * h_g * tw + (h + 1) * tw,
                    ] = tbl_ref[0, h].astype(wdt)

        yg = jax.lax.broadcasted_iota(
            jnp.int32, (1, RT), 1
        ).astype(jnp.float32)
        yg = (yg + t * RT) / max(Hn - 1.0, 1.0) * 2.0 - 1.0
        dy = (yg - py[:, None]) * 0.5
        fy = (dy + 1.0) * 0.5 * (th - 1)
        # ONE m1 matmul with both heads' tables side-by-side in lanes: the
        # (Ns*RT)-row M dim dominates this dot's cost (th, tw ≪ 128 at the
        # narrow stages), so halving the number of passes ~halves it.
        # `pack` > 1 goes further: the Ns samples split into `pack` groups
        # whose tap rows are shifted into disjoint K-blocks (coords + j*th,
        # confined to each group's own block — see _packed_taps) and
        # multiplied against a block-diagonal table, cutting the dominant
        # M row count by `pack` for the same result.
        if pack > 1:
            wy = _packed_taps(fy, pack, th).astype(wdt)  # (NsG*RT, pack*th)
        else:
            wy = _lerp_taps(fy, th).astype(wdt).reshape(Ns * RT, th)
        m1a = jax.lax.dot_general(
            wy, tall_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(wdt)  # (NsG*RT, pack*h_g*tw)
        for j in range(pack):
            for h in range(h_g):
                m1_ref[
                    :, h * RT : (h + 1) * RT, j * tw : (j + 1) * tw
                ] = m1a[
                    :, j * h_g * tw + h * tw : j * h_g * tw + (h + 1) * tw
                ].reshape(NsG, RT, tw)

        bias_p = jax.lax.dot_general(
            m1_ref[...], wx_ref[...],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (NsG, h_g*RT, pack*W); lane block j = group j's bias
        # per-group transposes into query-major (the per-(h, r) 2-D
        # transpose form cost 4.5 ms/block at stage 1), groups
        # concatenated back along lanes in (j, n_local) = n order
        bias_qm = jnp.concatenate(
            [
                jnp.transpose(
                    bias_p[:, :, j * W : (j + 1) * W], (1, 2, 0)
                )
                for j in range(pack)
            ],
            axis=2,
        ).reshape(h_g * RT * W, Ns)

    k = k_ref[0]
    v = v_ref[0]
    q2 = q_ref[0].reshape(RT * W, h_g * hc)
    for h in range(h_g):
        k_h = k[:, h * hc : (h + 1) * hc]  # (Ns, hc)
        v_h = v[:, h * hc : (h + 1) * hc]
        q2_h = q2[:, h * hc : (h + 1) * hc]  # (RT*W, hc)

        # s2[(r, x), n] — one full-lane matmul (N = Ns = 256)
        s2 = jax.lax.dot_general(
            q2_h, k_h,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (RT*W, Ns)
        if not nobias:
            s2 = s2 + bias_qm[h * RT * W : (h + 1) * RT * W, :]

        # softmax along lanes (the sampled points)
        s2 = s2 - jnp.max(s2, axis=1, keepdims=True)
        p2 = jnp.exp(s2)
        p2 = p2 / jnp.sum(p2, axis=1, keepdims=True)

        out_h = jax.lax.dot_general(
            p2.astype(v_h.dtype), v_h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (RT*W, hc)
        o_ref[0, :, :, h * hc : (h + 1) * hc] = out_h.astype(
            o_ref.dtype
        ).reshape(RT, W, hc)


def _v4_tiles(H: int, W: int, Ns: int, tw: int, h_g: int = 1):
    """(RT, XC) for the query-major kernel: the f32 (RT*W, Ns) s/p temps
    (~2 each) and the (Ns, h_g*RT, W) bias bound RT."""
    rt = max(1, min(H, 4_000_000 // max(1, Ns * W * 4 * max(h_g, 1))))
    while H % rt:
        rt -= 1
    xc = max(8, min(W, 2_000_000 // (Ns * max(tw, 1) * 4)))
    while W % xc:
        xc -= 1
    return rt, xc


def _v2_tiles(H: int, W: int, Ns: int, tw: int):
    """(RT, XC): row-tile height and x-chunk width for the v2 kernel."""
    # target ~2-4K queries per tile, bounded by the f32 bias temp
    # (Ns * RT * W * 4B <= ~2.5 MB) and the m1/wx scratch budget
    rt = max(1, min(H, (2_500_000 // (Ns * W * 4)) or 1))
    while H % rt:
        rt -= 1
    # x-chunk for the tap build: f32 temp Ns * XC * tw * 4B <= ~2 MB
    xc = max(8, min(W, 2_000_000 // (Ns * max(tw, 1) * 4)))
    while W % xc:
        xc -= 1
    return rt, xc


def auto_version(W: int) -> int:
    """version=0 selection: wide-lane kernel at wide stages, query-major
    at narrow ones. The module pads H/W up to sublane multiples
    (28->32 &c), so the v4 (RT, W, C) <-> (RT*W, C) shape casts are
    always legal; v2 remains reachable via the env override.

    v3 requires W to be a MULTIPLE of 128, not merely >= 128: its
    internal (RT, W) lane flatten is a Mosaic shape cast that is only
    layout-legal on full lane tiles. The >=128 gate shipped in round 3
    because every 512²/224² stage width is a power of two (128/64/32/16
    or 56/28/14/7-padded), but eval bucket shapes hit W=176 (704-wide
    pad) and Mosaic rejects the cast ("unsupported shape cast",
    vector<384x3072> -> <384x16x192>) — found by the round-5 e2e eval
    bench on real v5e."""
    if W >= 128 and W % 128 == 0:
        return 3
    if W % 8 == 0:
        return 4
    return 2


def fused_deform_attention_v2(
    q: jax.Array,      # (BG, H, W, Cg) grouped queries
    k: jax.Array,      # (BG, Ns, Cg)
    v: jax.Array,      # (BG, Ns, Cg)
    pos: jax.Array,    # (BG, Ns, 2) normalized (y, x) float32
    table: jax.Array,  # (g, h_g, th, tw)
    *,
    n_groups: int,
    scale: float,
    interpret: bool = False,
    version: int = 2,
    hn: int = 0,  # true (pre-pad) sizes for coordinate normalization;
    wn: int = 0,  # 0 means H/W are unpadded
) -> jax.Array:
    BG, H, W, Cg = q.shape
    Ns = k.shape[1]
    g, h_g, th, tw = table.shape
    hc = Cg // h_g
    hn, wn = hn or H, wn or W
    assert BG % n_groups == 0 and g == n_groups
    if version == 0:
        version = auto_version(W)
    if version == 3:
        RT, XC = _v3_tiles(H, W, Ns, tw, h_g)
    elif version == 4:
        RT, XC = _v4_tiles(H, W, Ns, tw, h_g)
    else:
        RT, XC = _v2_tiles(H, W, Ns, tw)
    grid = (BG, H // RT)

    out_dtype = q.dtype
    if not interpret:
        # bf16 in-kernel regardless of trace dtype: model.init traces with
        # f32 params, which would double every scratch buffer and blow the
        # scoped-VMEM budget; production compute is bf16 anyway.
        q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
        table = table.astype(jnp.bfloat16)

    # debug knob for perf attribution: skip the RPE-bias path
    kw = {"nobias": os.environ.get("DAT_TPU_KERNEL_NOBIAS", "0") == "1"}
    pack = 1
    if version == 4:
        pack = _m1_pack(Ns, th, tw, h_g)
        kw["pack"] = pack
    kfn = {2: _kernel_v2, 3: _kernel_v3, 4: _kernel_v4}[version]
    kernel = functools.partial(
        kfn, H=H, W=W, RT=RT, XC=XC, h_g=h_g, hc=hc, th=th, tw=tw,
        scale=scale, Hn=hn, Wn=wn, **kw,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Ns, 2), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT, W, Cg), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ns, Cg), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ns, Cg), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_g, th, tw), lambda b, t: (b % g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RT, W, Cg), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BG, H, W, Cg), q.dtype),
        scratch_shapes=[
            pltpu.VMEM(
                (Ns // pack, pack * W, pack * tw) if version == 4
                else (Ns, W, tw),
                q.dtype,
            ),
            pltpu.VMEM(
                (Ns // pack, h_g * RT, pack * tw) if version == 4
                else (Ns, h_g * RT, tw) if version == 3
                else (h_g, Ns, RT, tw),
                q.dtype,
            ),
        ] + (
            [pltpu.VMEM((pack * th, pack * h_g * tw), q.dtype)]
            if version == 4 else []
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # v5e has 128 MB of VMEM; the default 16 MB scoped budget is
            # what forced v1's 32-lane x-blocks. v3/v4's folded
            # (Ns, h_g*RT, W) f32 bias temp needs the larger budget.
            vmem_limit_bytes=(96 if version in (3, 4) else 64) * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * BG * H * W * Ns * (2 * hc * h_g + tw * h_g)
            + 2 * BG * H * Ns * th * tw * h_g,
            bytes_accessed=q.size * q.dtype.itemsize * 2
            + (k.size + v.size) * k.dtype.itemsize * (H // RT),
            transcendentals=BG * H * W * Ns * h_g,
        ),
    )(pos.astype(jnp.float32), q, k, v, table).astype(out_dtype)


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


def _bwd_tiles(H: int, W: int, Ns: int, tw: int, h_g: int = 1):
    """(RT, XC) for the backward kernel. The bias-gradient batched
    matmuls run with M = h_g*RT rows (heads folded), so RT targets
    h_g*RT = 64 — bounded by the f32 (Ns, h_g*RT, W) ds/cx temporaries
    and by Mosaic compile time of the RT-unrolled attention-grad dots."""
    _, xc = _v2_tiles(H, W, Ns, tw)
    hr = max(1, min(64, 8_000_000 // max(1, Ns * W * 4)))
    rt = max(1, min(H, hr // max(h_g, 1)))
    while H % rt:
        rt -= 1
    return rt, xc


def _bwd_tiles_v4(H: int, W: int, Ns: int, tw: int, h_g: int = 1):
    """(RT, XC) for the query-major backward: the f32 (h_g*RT, W, Ns)
    ds scratch and the (Ns, h_g*RT, W) bias/cx temporaries bound RT."""
    rt = max(1, min(H, 4_000_000 // max(1, Ns * W * 4 * max(h_g, 1))))
    while H % rt:
        rt -= 1
    xc = max(8, min(W, 2_000_000 // (Ns * max(tw, 1) * 4)))
    while W % xc:
        xc -= 1
    return rt, xc


def _kernel_v2_bwd(
    pos_ref,    # (1, Ns, 2) f32, (y, x) normalized
    q_ref,      # (1, RT, W, Cg)
    k_ref,      # (1, Ns, Cg)
    v_ref,      # (1, Ns, Cg)
    tbl_ref,    # (1, h_g, th, tw)
    do_ref,     # (1, RT, W, Cg) output cotangent
    dq_ref,     # (1, RT, W, Cg) out
    dk_ref,     # (1, Ns, Cg) f32 out, accumulated over row tiles
    dv_ref,     # (1, Ns, Cg) f32 out, accumulated over row tiles
    dpos_ref,   # (1, 2, Ns) f32 out (y, x rows), accumulated
    dtbl_ref,   # (1, h_g, th, tw) f32 out, accumulated (per-bg slice;
                #   summed over the batch outside the kernel)
    wx_ref,     # VMEM scratch (Ns, W, tw): x tap weights (per bg)
    dtapx_ref,  # VMEM scratch (Ns, W, tw): d(x taps)/d(fx) (per bg)
    m1_ref,     # VMEM scratch (Ns, h_g*RT, tw): head-folded interp table
    ds_ref,     # VMEM scratch (Ns, h_g*RT, W) f32: head-folded logit grads
    *,
    H: int,
    W: int,
    RT: int,
    XC: int,
    h_g: int,
    hc: int,
    th: int,
    tw: int,
    scale: float,
    Hn: int,
    Wn: int,
    nobias: bool = False,
):
    """Fused backward: recomputes p tile-by-tile in VMEM (same math as
    the forward kernel) and emits all five input gradients without ever
    materializing the (HW x Ns) attention/bias tensors in HBM — the XLA
    recompute backward it replaces was paying that full HBM round-trip.

    ``nobias`` mirrors the forward kernels' DAT_TPU_KERNEL_NOBIAS debug
    knob: the softmax recompute skips the RPE bias and the whole
    bias-path gradient tail is elided (dpos/dtable stay zero), so
    attribution benches measure — and differentiate — the same function
    the nobias forward computes.
    """
    Ns = pos_ref.shape[1]
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    wdt = q_ref.dtype

    py = pos_ref[0, :, 0]  # (Ns,)
    px = pos_ref[0, :, 1]

    @pl.when(t == 0)
    def _init():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)
        dpos_ref[...] = jnp.zeros(dpos_ref.shape, dpos_ref.dtype)
        dtbl_ref[...] = jnp.zeros(dtbl_ref.shape, dtbl_ref.dtype)

        if not nobias:

            def body(i, carry):
                xg = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, XC), 1) + i * XC
                ).astype(jnp.float32)
                xg = xg / max(Wn - 1.0, 1.0) * 2.0 - 1.0
                dx = (xg - px[:, None]) * 0.5
                fx = (dx + 1.0) * 0.5 * (tw - 1)
                wx_ref[:, pl.ds(i * XC, XC), :] = _lerp_taps(fx, tw).astype(
                    wdt
                )
                i0x = jnp.floor(fx).astype(jnp.int32)[..., None]
                tapsx = jax.lax.broadcasted_iota(jnp.int32, (Ns, XC, tw), 2)
                dtapx_ref[:, pl.ds(i * XC, XC), :] = (
                    jnp.where(tapsx == i0x + 1, 1.0, 0.0)
                    - jnp.where(tapsx == i0x, 1.0, 0.0)
                ).astype(wdt)
                return carry

            jax.lax.fori_loop(0, W // XC, body, 0)

    # --- recompute fy / wy / m1 for this row tile (as in the forward)
    yg = jax.lax.broadcasted_iota(jnp.int32, (1, RT), 1).astype(jnp.float32)
    yg = (yg + t * RT) / max(Hn - 1.0, 1.0) * 2.0 - 1.0
    dy = (yg - py[:, None]) * 0.5  # (Ns, RT)
    fy = (dy + 1.0) * 0.5 * (th - 1)
    wy = _lerp_taps(fy, th).astype(wdt)  # (Ns, RT, th)
    wy2 = wy.reshape(Ns * RT, th)
    if not nobias:
        for h in range(h_g):
            m1 = jax.lax.dot_general(
                wy2, tbl_ref[0, h].astype(wdt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m1_ref[:, h * RT : (h + 1) * RT, :] = m1.astype(wdt).reshape(
                Ns, RT, tw
            )

    # d(lerp taps)/d(coord): -1 at tap floor(f), +1 at floor(f)+1 (the
    # same subgradient lerp_weight_matrix's autodiff produces); OOB taps
    # contribute zero because the one-hots never match.
    i0y = jnp.floor(fy).astype(jnp.int32)[..., None]
    tapsy = jax.lax.broadcasted_iota(jnp.int32, (Ns, RT, th), 2)
    dtapy = (
        jnp.where(tapsy == i0y + 1, 1.0, 0.0)
        - jnp.where(tapsy == i0y, 1.0, 0.0)
    ).astype(wdt)
    dtapy2 = dtapy.reshape(Ns * RT, th)

    # bias for every head at once: (Ns, h_g*RT, W), M = h_g*RT MXU rows
    if nobias:
        bias_all = None
    else:
        bias_all = jax.lax.dot_general(
            m1_ref[...], wx_ref[...],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    k = k_ref[0]
    v = v_ref[0]
    for h in range(h_g):
        k_h = k[:, h * hc : (h + 1) * hc]  # (Ns, hc)
        v_h = v[:, h * hc : (h + 1) * hc]

        dk_h = jnp.zeros((Ns, hc), jnp.float32)
        dv_h = jnp.zeros((Ns, hc), jnp.float32)
        for r in range(RT):
            q_rh = q_ref[0, r, :, h * hc : (h + 1) * hc]   # (W, hc)
            do_rh = do_ref[0, r, :, h * hc : (h + 1) * hc]  # (W, hc)

            # recompute p (exactly the forward's math, f32)
            s = jax.lax.dot_general(
                k_h, q_rh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Ns, W)
            s = s * scale
            if not nobias:
                s = s + bias_all[:, h * RT + r, :]
            s = s - jnp.max(s, axis=0, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=0, keepdims=True)
            p_lo = p.astype(wdt)

            # dv_h[n, c] += sum_x p[n, x] do[x, c]
            dv_h = dv_h + jax.lax.dot_general(
                p_lo, do_rh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dp[n, x] = sum_c v[n, c] do[x, c]
            dp = jax.lax.dot_general(
                v_h, do_rh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Ns, W)
            # softmax backward over Ns (axis 0)
            ds = p * (dp - jnp.sum(p * dp, axis=0, keepdims=True))
            ds_lo = ds.astype(wdt)
            if not nobias:
                ds_ref[:, h * RT + r, :] = ds

            # dq[x, c] = scale * sum_n ds[n, x] k[n, c]
            dq_rh = jax.lax.dot_general(
                ds_lo, k_h,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (W, hc)
            dq_ref[0, r, :, h * hc : (h + 1) * hc] = (dq_rh * scale).astype(
                dq_ref.dtype
            )
            # dk_h[n, c] += scale * sum_x ds[n, x] q[x, c]
            dk_h = dk_h + scale * jax.lax.dot_general(
                ds_lo, q_rh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        dk_ref[0, :, h * hc : (h + 1) * hc] += dk_h
        dv_ref[0, :, h * hc : (h + 1) * hc] += dv_h

    if nobias:  # bias path elided: dpos/dtable stay at their zero init
        return

    # --- bias-path gradients, all heads folded (dbias == ds)
    ds_all = ds_ref[...].astype(wdt)  # (Ns, h_g*RT, W)
    # dm1[n, m, u] = sum_x ds[n, m, x] wx[n, x, u]  (M = h_g*RT rows)
    dm1 = jax.lax.dot_general(
        ds_all, wx_ref[...],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (Ns, h_g*RT, tw)
    dm1_lo = dm1.astype(wdt)

    dpy_acc = jnp.zeros((1, Ns), jnp.float32)
    for h in range(h_g):
        dm1_h2 = dm1_lo[:, h * RT : (h + 1) * RT, :].reshape(Ns * RT, tw)
        # dtable[t, u] += sum_{n, r} wy[n, r, t] dm1[n, r, u]
        dtbl_ref[0, h] += jax.lax.dot_general(
            wy2, dm1_h2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dpy: dfy[n, r] = sum_u dm1[n, r, u] * (sum_t dtapy[n, r, t] T[t, u])
        g1 = jax.lax.dot_general(
            dtapy2, tbl_ref[0, h].astype(wdt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Ns*RT, tw)
        # rank-2 all the way down: Mosaic's layout inference rejects the
        # rank-1 intermediates a flat axis=(1,2) reduction produces.
        dfy = (dm1_h2.astype(jnp.float32) * g1).reshape(Ns, RT, tw)
        dfy_nr = jnp.sum(dfy, axis=2)  # (Ns, RT)
        dpy_acc = dpy_acc + jnp.sum(
            jnp.transpose(dfy_nr), axis=0, keepdims=True
        )

    # dpx: dfx[n, x] = sum_{m, u} ds[n, m, x] m1[n, m, u] dtapx[n, x, u]
    # — contract (m1, dtapx) over u first (a lane-dim dynamic-slice
    # chunked form trips Mosaic: lane slices must be 128-aligned).
    cx = jax.lax.dot_general(
        m1_ref[...], dtapx_ref[...],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (Ns, h_g*RT, W)
    dfx_nm = jnp.sum(ds_ref[...] * cx, axis=2)  # (Ns, h_g*RT)
    dpx_acc = jnp.sum(jnp.transpose(dfx_nm), axis=0, keepdims=True)

    # chain rule through fy = ((yg - py) * 0.5 + 1) * 0.5 * (th - 1)
    dpos_ref[0] += jnp.concatenate(
        [dpy_acc * (-0.25 * (th - 1)), dpx_acc * (-0.25 * (tw - 1))], axis=0
    )


def _kernel_v4_bwd(
    pos_ref,    # (1, Ns, 2) f32, (y, x) normalized
    q_ref,      # (1, RT, W, Cg)
    k_ref,      # (1, Ns, Cg)
    v_ref,      # (1, Ns, Cg)
    tbl_ref,    # (1, h_g, th, tw)
    do_ref,     # (1, RT, W, Cg) output cotangent
    dq_ref,     # (1, RT, W, Cg) out
    dk_ref,     # (1, Ns, Cg) f32 out, accumulated over row tiles
    dv_ref,     # (1, Ns, Cg) f32 out, accumulated over row tiles
    dpos_ref,   # (1, 2, Ns) f32 out (y, x rows), accumulated
    dtbl_ref,   # (1, h_g, th, tw) f32 out, accumulated
    wx_ref,     # VMEM scratch (Ns/pack, pack*W, pack*tw): block-diag
    dtapx_ref,  # VMEM scratch (Ns/pack, pack*W, pack*tw): block-diag
    m1_ref,     # VMEM scratch (Ns/pack, h_g*RT, pack*tw): group-packed
    ds_ref,     # VMEM scratch (h_g*RT, W, Ns) f32: QUERY-major logit grads
    tall_ref,   # VMEM scratch (pack*th, pack*h_g*tw): block-diag table
    *,
    H: int,
    W: int,
    RT: int,
    XC: int,
    h_g: int,
    hc: int,
    th: int,
    tw: int,
    scale: float,
    Hn: int,
    Wn: int,
    pack: int = 1,
    nobias: bool = False,
):
    """Query-major backward for narrow-W stages (the v4 forward's layout,
    VERDICT r2 weak #2: the v2-layout backward's per-row (., W)-lane dots
    waste 50-87% of the MXU columns at W = 64/32/16).

    All attention-path gradients run as (RT*W, Ns)/(RT*W, hc) matmuls with
    Ns = 256 lanes and softmax-backward reductions along lanes; ds crosses
    back to sample-major for the shared bias-gradient tail via ONE 3-D
    transpose (the same trick the v4 forward uses for the bias).
    """
    Ns = pos_ref.shape[1]
    t = pl.program_id(1)
    wdt = q_ref.dtype

    py = pos_ref[0, :, 0]
    px = pos_ref[0, :, 1]

    @pl.when(t == 0)
    def _init():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)
        dpos_ref[...] = jnp.zeros(dpos_ref.shape, dpos_ref.dtype)
        dtbl_ref[...] = jnp.zeros(dtbl_ref.shape, dtbl_ref.dtype)
        if nobias:
            return
        if pack > 1:
            tall_ref[...] = jnp.zeros(tall_ref.shape, wdt)
            wx_ref[...] = jnp.zeros(wx_ref.shape, wdt)
            dtapx_ref[...] = jnp.zeros(dtapx_ref.shape, wdt)
        for j in range(pack):
            for h in range(h_g):
                tall_ref[
                    j * th : (j + 1) * th,
                    j * h_g * tw + h * tw : j * h_g * tw + (h + 1) * tw,
                ] = tbl_ref[0, h].astype(wdt)

        def body(i, carry):
            xg = (
                jax.lax.broadcasted_iota(jnp.int32, (1, XC), 1) + i * XC
            ).astype(jnp.float32)
            xg = xg / max(Wn - 1.0, 1.0) * 2.0 - 1.0
            dx = (xg - px[:, None]) * 0.5
            fx = (dx + 1.0) * 0.5 * (tw - 1)
            w = _lerp_taps(fx, tw).astype(wdt)  # (Ns, XC, tw)
            i0x = jnp.floor(fx).astype(jnp.int32)[..., None]
            tapsx = jax.lax.broadcasted_iota(jnp.int32, (Ns, XC, tw), 2)
            dt = (
                jnp.where(tapsx == i0x + 1, 1.0, 0.0)
                - jnp.where(tapsx == i0x, 1.0, 0.0)
            ).astype(wdt)
            NsG_ = Ns // pack
            for j in range(pack):
                sl = pl.ds(j * W + i * XC, XC)
                lj = slice(j * tw, (j + 1) * tw)
                wx_ref[:, sl, lj] = w[j * NsG_ : (j + 1) * NsG_]
                dtapx_ref[:, sl, lj] = dt[j * NsG_ : (j + 1) * NsG_]
            return carry

        jax.lax.fori_loop(0, W // XC, body, 0)

    # --- recompute fy / wy / m1 (head-folded + sample-group packed, as
    # the forward: groups' taps shift into disjoint K-blocks against the
    # block-diagonal table, cutting the dominant M row count by `pack`)
    NsG = Ns // pack
    yg = jax.lax.broadcasted_iota(jnp.int32, (1, RT), 1).astype(jnp.float32)
    yg = (yg + t * RT) / max(Hn - 1.0, 1.0) * 2.0 - 1.0
    dy = (yg - py[:, None]) * 0.5
    fy = (dy + 1.0) * 0.5 * (th - 1)
    if nobias:
        bias_qm = None
        wy2 = dtapy2 = None
    else:
        if pack > 1:
            wy2, dtapy2 = _packed_taps(fy, pack, th, deriv=True)
            wy2 = wy2.astype(wdt)
            dtapy2 = dtapy2.astype(wdt)  # (NsG*RT, pack*th)
        else:
            wy2 = _lerp_taps(fy, th).astype(wdt).reshape(Ns * RT, th)
            i0y = jnp.floor(fy).astype(jnp.int32)[..., None]
            tapsy = jax.lax.broadcasted_iota(jnp.int32, (Ns, RT, th), 2)
            dtapy2 = (
                jnp.where(tapsy == i0y + 1, 1.0, 0.0)
                - jnp.where(tapsy == i0y, 1.0, 0.0)
            ).astype(wdt).reshape(Ns * RT, th)
        m1a = jax.lax.dot_general(
            wy2, tall_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(wdt)  # (NsG*RT, pack*h_g*tw)
        for j in range(pack):
            for h in range(h_g):
                m1_ref[
                    :, h * RT : (h + 1) * RT, j * tw : (j + 1) * tw
                ] = m1a[
                    :, j * h_g * tw + h * tw : j * h_g * tw + (h + 1) * tw
                ].reshape(NsG, RT, tw)

        # bias recompute as a group-packed batched matmul (Ns/pack batch
        # elements against block-diag x-taps), then per-group transposes
        # into query-major rows (h, r, x), lanes back in (j, n_local) = n
        # order
        bias_p = jax.lax.dot_general(
            m1_ref[...], wx_ref[...],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (NsG, h_g*RT, pack*W)
        bias_qm = jnp.concatenate(
            [
                jnp.transpose(bias_p[:, :, j * W : (j + 1) * W], (1, 2, 0))
                for j in range(pack)
            ],
            axis=2,
        ).reshape(h_g * RT * W, Ns)

    k = k_ref[0]
    v = v_ref[0]
    q2 = q_ref[0].reshape(RT * W, h_g * hc)
    do2 = do_ref[0].reshape(RT * W, h_g * hc)
    for h in range(h_g):
        k_h = k[:, h * hc : (h + 1) * hc]  # (Ns, hc)
        v_h = v[:, h * hc : (h + 1) * hc]
        q2_h = q2[:, h * hc : (h + 1) * hc]   # (RT*W, hc)
        do2_h = do2[:, h * hc : (h + 1) * hc]

        # recompute p2 (query-major, f32) exactly like the v4 forward
        s2 = jax.lax.dot_general(
            q2_h, k_h,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (RT*W, Ns)
        if not nobias:
            s2 = s2 + bias_qm[h * RT * W : (h + 1) * RT * W, :]
        s2 = s2 - jnp.max(s2, axis=1, keepdims=True)
        p2 = jnp.exp(s2)
        p2 = p2 / jnp.sum(p2, axis=1, keepdims=True)
        p2_lo = p2.astype(wdt)

        # dv[n, c] = sum_m p2[m, n] do2[m, c]   (contract over RT*W rows)
        dv_ref[0, :, h * hc : (h + 1) * hc] += jax.lax.dot_general(
            p2_lo, do2_h,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dp2[m, n] = sum_c do2[m, c] v[n, c]
        dp2 = jax.lax.dot_general(
            do2_h, v_h,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (RT*W, Ns)
        # softmax backward along lanes
        ds2 = p2 * (dp2 - jnp.sum(p2 * dp2, axis=1, keepdims=True))
        ds2_lo = ds2.astype(wdt)
        if not nobias:
            ds_ref[h * RT : (h + 1) * RT] = ds2.reshape(RT, W, Ns)

        # dq[m, c] = scale * sum_n ds2[m, n] k[n, c]
        dq2_h = jax.lax.dot_general(
            ds2_lo, k_h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (RT*W, hc)
        dq_ref[0, :, :, h * hc : (h + 1) * hc] = (
            dq2_h * scale
        ).astype(dq_ref.dtype).reshape(RT, W, hc)
        # dk[n, c] += scale * sum_m ds2[m, n] q2[m, c]
        dk_ref[0, :, h * hc : (h + 1) * hc] += scale * jax.lax.dot_general(
            ds2_lo, q2_h,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if nobias:  # bias path elided: dpos/dtable stay at their zero init
        return

    # --- bias-path gradients: cross back to sample-major ---------------
    # group-packed: ds lanes regroup as (j, x) blocks so all three
    # batched matmuls (dm1, bias recompute above, cx below) run with
    # Ns/pack batch elements against block-diag operands
    ds_p32 = jnp.concatenate(
        [
            jnp.transpose(
                ds_ref[:, :, j * NsG : (j + 1) * NsG], (2, 0, 1)
            )
            for j in range(pack)
        ],
        axis=2,
    )  # (NsG, h_g*RT, pack*W) f32
    dm1 = jax.lax.dot_general(
        ds_p32.astype(wdt), wx_ref[...],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (NsG, h_g*RT, pack*tw): lane blocks (j, u)
    dm1_lo = dm1.astype(wdt)

    # re-pack dm1 into the (NsG*RT, pack*h_g*tw) m1a lane layout: ONE
    # row-contraction then yields every (group, head) dtable block on
    # the diagonal, and ONE dtapy matmul against the block-diag table
    # gives every head's g1 — pack*h_g fewer matmuls, with pack x fewer
    # K-depth passes in the dtable contraction.
    dm1p = jnp.concatenate(
        [
            dm1_lo[
                :, h * RT : (h + 1) * RT, j * tw : (j + 1) * tw
            ].reshape(NsG * RT, tw)
            for j in range(pack)
            for h in range(h_g)
        ],
        axis=1,
    )  # (NsG*RT, pack*h_g*tw)
    dtb = jax.lax.dot_general(
        wy2, dm1p,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (pack*th, pack*h_g*tw); diagonal blocks are per-group dtables
    for h in range(h_g):
        acc = dtb[0:th, h * tw : (h + 1) * tw]
        for j in range(1, pack):
            acc = acc + dtb[
                j * th : (j + 1) * th,
                j * h_g * tw + h * tw : j * h_g * tw + (h + 1) * tw,
            ]
        dtbl_ref[0, h] += acc

    g1p = jax.lax.dot_general(
        dtapy2, tall_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (NsG*RT, pack*h_g*tw)
    dfyp = dm1p.astype(jnp.float32) * g1p
    dfy_sum = jnp.sum(
        dfyp.reshape(NsG, RT, pack * h_g * tw), axis=1
    )  # (NsG, pack*h_g*tw)
    dpy_parts = []
    for j in range(pack):
        s = jnp.sum(
            dfy_sum[:, j * h_g * tw : (j + 1) * h_g * tw],
            axis=1, keepdims=True,
        )  # (NsG, 1)
        dpy_parts.append(jnp.transpose(s))  # (1, NsG)
    dpy_acc = (
        jnp.concatenate(dpy_parts, axis=1) if pack > 1 else dpy_parts[0]
    )

    cx = jax.lax.dot_general(
        m1_ref[...], dtapx_ref[...],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (NsG, h_g*RT, pack*W): lane blocks (j, x)
    dfx_sum = jnp.sum(ds_p32 * cx, axis=1)  # (NsG, pack*W)
    dpx_parts = []
    for j in range(pack):
        s = jnp.sum(
            dfx_sum[:, j * W : (j + 1) * W], axis=1, keepdims=True
        )  # (NsG, 1)
        dpx_parts.append(jnp.transpose(s))  # (1, NsG)
    dpx_acc = (
        jnp.concatenate(dpx_parts, axis=1) if pack > 1 else dpx_parts[0]
    )

    dpos_ref[0] += jnp.concatenate(
        [dpy_acc * (-0.25 * (th - 1)), dpx_acc * (-0.25 * (tw - 1))], axis=0
    )


def fused_deform_attention_bwd_v2(
    q: jax.Array,      # (BG, H, W, Cg)
    k: jax.Array,      # (BG, Ns, Cg)
    v: jax.Array,      # (BG, Ns, Cg)
    pos: jax.Array,    # (BG, Ns, 2) normalized (y, x) float32
    table: jax.Array,  # (g, h_g, th, tw)
    dout: jax.Array,   # (BG, H, W, Cg)
    *,
    n_groups: int,
    scale: float,
    interpret: bool = False,
    hn: int = 0,
    wn: int = 0,
):
    """Fused-backward pass; returns (dq, dk, dv, dpos, dtable).

    Layout auto-selection mirrors the forward: sample-major (v2 layout)
    where W fills the 128 lanes, query-major (v4 layout) at narrow
    8-aligned stages. DAT_TPU_BWD_LAYOUT=v2|v4 overrides.
    """
    BG, H, W, Cg = q.shape
    Ns = k.shape[1]
    g, h_g, th, tw = table.shape
    hc = Cg // h_g
    hn, wn = hn or H, wn or W
    assert BG % n_groups == 0 and g == n_groups
    layout = os.environ.get("DAT_TPU_BWD_LAYOUT", "auto")
    if layout == "auto":
        layout = "v4" if (W < 128 and W % 8 == 0) else "v2"
    if layout == "v4":
        RT, XC = _bwd_tiles_v4(H, W, Ns, tw, h_g)
    else:
        RT, XC = _bwd_tiles(H, W, Ns, tw, h_g)
    grid = (BG, H // RT)

    in_dtypes = (q.dtype, k.dtype, v.dtype, pos.dtype, table.dtype)
    if not interpret:
        q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
        table = table.astype(jnp.bfloat16)
        dout = dout.astype(jnp.bfloat16)
    kdt = q.dtype

    pack = _m1_pack(Ns, th, tw, h_g) if layout == "v4" else 1
    kernel = functools.partial(
        _kernel_v4_bwd if layout == "v4" else _kernel_v2_bwd,
        H=H, W=W, RT=RT, XC=XC, h_g=h_g, hc=hc, th=th,
        tw=tw, scale=scale, Hn=hn, Wn=wn,
        # mirror the forward's attribution knob so grads match the
        # nobias forward and the bias backward cost is really excluded
        nobias=os.environ.get("DAT_TPU_KERNEL_NOBIAS", "0") == "1",
        **({"pack": pack} if layout == "v4" else {}),
    )
    dq, dk, dv, dpos_t, dtbl_b = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Ns, 2), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT, W, Cg), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ns, Cg), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ns, Cg), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_g, th, tw), lambda b, t: (b % g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT, W, Cg), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RT, W, Cg), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ns, Cg), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ns, Cg), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, Ns), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_g, th, tw), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BG, H, W, Cg), kdt),
            jax.ShapeDtypeStruct((BG, Ns, Cg), jnp.float32),
            jax.ShapeDtypeStruct((BG, Ns, Cg), jnp.float32),
            jax.ShapeDtypeStruct((BG, 2, Ns), jnp.float32),
            jax.ShapeDtypeStruct((BG, h_g, th, tw), jnp.float32),
        ],
        scratch_shapes=(
            [
                pltpu.VMEM((Ns // pack, pack * W, pack * tw), kdt),
                pltpu.VMEM((Ns // pack, pack * W, pack * tw), kdt),
                pltpu.VMEM((Ns // pack, h_g * RT, pack * tw), kdt),
                pltpu.VMEM((h_g * RT, W, Ns), jnp.float32),
                pltpu.VMEM((pack * th, pack * h_g * tw), kdt),
            ]
            if layout == "v4"
            else [
                pltpu.VMEM((Ns, W, tw), kdt),
                pltpu.VMEM((Ns, W, tw), kdt),
                pltpu.VMEM((Ns, h_g * RT, tw), kdt),
                pltpu.VMEM((Ns, h_g * RT, W), jnp.float32),
            ]
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * BG * H * W * Ns * (2 * hc * h_g + tw * h_g)
            + 6 * BG * H * Ns * th * tw * h_g,
            bytes_accessed=3 * q.size * q.dtype.itemsize
            + 2 * (k.size + v.size) * k.dtype.itemsize * (H // RT),
            transcendentals=BG * H * W * Ns * h_g,
        ),
    )(pos.astype(jnp.float32), q, k, v, table, dout)

    dpos = jnp.transpose(dpos_t, (0, 2, 1))          # (BG, Ns, 2)
    dtable = dtbl_b.reshape(BG // g, g, h_g, th, tw).sum(0)
    qd, kd_, vd, posd, tbld = in_dtypes
    return (
        dq.astype(qd),
        dk.astype(kd_),
        dv.astype(vd),
        dpos.astype(posd),
        dtable.astype(tbld),
    )


def _xla_reference(q, k, v, pos, table, *, n_groups, scale, hn=0, wn=0):
    """Composite (unfused) computation used for the backward pass and for
    correctness testing. Must match the kernel semantics exactly."""
    BG, H, W, Cg = q.shape
    Ns = k.shape[1]
    g, h_g, th, tw = table.shape
    hc = Cg // h_g
    hn, wn = hn or H, wn or W
    from ..grid_sample import lerp_weight_matrix

    qh = q.reshape(BG, H * W, h_g, hc)
    kh = k.reshape(BG, Ns, h_g, hc)
    vh = v.reshape(BG, Ns, h_g, hc)
    attn = jnp.einsum(
        "bmhc,bnhc->bhmn", qh, kh, preferred_element_type=jnp.float32
    ) * scale

    yg = jnp.arange(H, dtype=jnp.float32) / max(hn - 1.0, 1.0) * 2.0 - 1.0
    xg = jnp.arange(W, dtype=jnp.float32) / max(wn - 1.0, 1.0) * 2.0 - 1.0
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


def _fwd_impl(q, k, v, pos, table, n_groups, scale, interpret, version,
              hn=0, wn=0):
    if version == 1:
        assert not hn and not wn, "v1 kernel has no padded-shape support"
        return fused_deform_attention_fwd(
            q, k, v, pos, table, n_groups=n_groups, scale=scale,
            interpret=interpret,
        )
    return fused_deform_attention_v2(
        q, k, v, pos, table, n_groups=n_groups, scale=scale,
        interpret=interpret, version=version, hn=hn, wn=wn,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def fused_deform_attention(q, k, v, pos, table, n_groups, scale,
                           interpret=False, version=2, fused_bwd=True,
                           hn=0, wn=0):
    """Fused forward with a fused backward (``fused_bwd=True``, default)
    or an XLA-composite recompute backward.

    ``hn``/``wn`` are the true (pre-pad) spatial sizes when q has been
    zero-padded up to sublane multiples (0 = unpadded); padded query rows
    produce garbage output the caller slices away, and their zero
    cotangents contribute nothing to any gradient.

    Either way only (q, k, v, pos, table) are saved as residuals — far
    less activation memory than XLA autodiff through the composite, which
    also keeps the (HW x Ns) attention/bias tensors.
    """
    return _fwd_impl(q, k, v, pos, table, n_groups, scale, interpret,
                     version, hn, wn)


def _fda_fwd(q, k, v, pos, table, n_groups, scale, interpret, version,
             fused_bwd, hn, wn):
    out = _fwd_impl(q, k, v, pos, table, n_groups, scale, interpret,
                    version, hn, wn)
    return out, (q, k, v, pos, table)


def _fda_bwd(n_groups, scale, interpret, version, fused_bwd, hn, wn,
             residuals, grad):
    q, k, v, pos, table = residuals
    if fused_bwd:
        return fused_deform_attention_bwd_v2(
            q, k, v, pos, table, grad, n_groups=n_groups, scale=scale,
            interpret=interpret, hn=hn, wn=wn,
        )
    _, vjp = jax.vjp(
        lambda q_, k_, v_, pos_, tbl_: _xla_reference(
            q_, k_, v_, pos_, tbl_, n_groups=n_groups, scale=scale,
            hn=hn, wn=wn,
        ),
        q, k, v, pos, table,
    )
    return vjp(grad)


fused_deform_attention.defvjp(_fda_fwd, _fda_bwd)
