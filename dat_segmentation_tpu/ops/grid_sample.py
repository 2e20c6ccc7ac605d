"""Bilinear grid sampling with exact torch.nn.functional.grid_sample parity.

This is the TPU-native replacement for the ATen `grid_sample` kernel the
reference leans on for (a) deformed key/value gathering and (b) continuous
relative-position-bias table sampling (reference: models/utils/dat_blocks.py:169-172
and :206-210). Implemented as a pure-jnp gather + lerp so XLA can fuse it;
the fused Pallas deformable-attention kernel has its own in-kernel variant.

Semantics matched to ATen (mode='bilinear'):
* ``align_corners=True``: grid -1 -> pixel 0, +1 -> pixel (size-1).
* ``align_corners=False``: grid -1 -> -0.5, +1 -> size-0.5 (pixel centers).
* ``padding_mode='zeros'``: out-of-bounds corner taps contribute zero.
* ``padding_mode='border'``: coordinates clamped to the edge pixels.

Grid last-dim ordering is (x, y) like torch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


@functools.partial(jax.jit, static_argnames=("align_corners", "padding_mode"))
def grid_sample(
    x: jax.Array,
    grid: jax.Array,
    *,
    align_corners: bool = True,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Bilinear sample ``x`` (NHWC) at ``grid`` locations.

    Args:
      x: (B, H, W, C) source feature map.
      grid: (B, Hg, Wg, 2) sampling locations, last dim (x, y), in [-1, 1].
      align_corners / padding_mode: ATen-compatible flags.

    Returns:
      (B, Hg, Wg, C) sampled values, dtype of ``x``.
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    B, H, W, C = x.shape
    gB, Hg, Wg, two = grid.shape
    assert two == 2 and gB == B, (x.shape, grid.shape)

    compute_dtype = jnp.promote_types(grid.dtype, jnp.float32)
    fx = _unnormalize(grid[..., 0].astype(compute_dtype), W, align_corners)
    fy = _unnormalize(grid[..., 1].astype(compute_dtype), H, align_corners)

    if padding_mode == "border":
        fx = jnp.clip(fx, 0.0, W - 1)
        fy = jnp.clip(fy, 0.0, H - 1)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    xs = x.reshape(B, H * W, C)
    out = jnp.zeros((B, Hg, Wg, C), dtype=compute_dtype)
    # 4-corner weighted gather; zero weight for out-of-bounds corners
    # reproduces ATen's zeros padding exactly (each corner masked separately).
    for dy, wy in ((0, 1.0 - ty), (1, ty)):
        yy = y0i + dy
        vy = (yy >= 0) & (yy <= H - 1)
        yyc = jnp.clip(yy, 0, H - 1)
        for dx, wx in ((0, 1.0 - tx), (1, tx)):
            xx = x0i + dx
            vx = (xx >= 0) & (xx <= W - 1)
            xxc = jnp.clip(xx, 0, W - 1)
            w = wy * wx
            if padding_mode == "zeros":
                w = jnp.where(vy & vx, w, 0.0)
            flat = (yyc * W + xxc).reshape(B, Hg * Wg)
            vals = jnp.take_along_axis(xs, flat[..., None], axis=1)
            out = out + vals.reshape(B, Hg, Wg, C).astype(compute_dtype) * w[..., None]
    return out.astype(x.dtype)


def lerp_weight_matrix(
    coords: jax.Array, size: int, dtype=jnp.float32
) -> jax.Array:
    """(..., size) bilinear tap weights for unnormalized ``coords``.

    Row r has weight (1-t) at floor(c) and t at floor(c)+1; taps falling
    outside [0, size) get zero weight — exactly ATen's zeros padding.
    Multiplying by this matrix IS a bilinear gather, but it runs on the
    MXU as a dense matmul instead of a scalarizing TPU gather (the reason
    the composite grid_sample path is ~1000x off roofline on v5e).
    """
    i0 = jnp.floor(coords)
    t = (coords - i0)[..., None]
    i0 = i0.astype(jnp.int32)[..., None]
    taps = jax.lax.broadcasted_iota(
        jnp.int32, (1,) * coords.ndim + (size,), coords.ndim
    )
    w = jnp.where(taps == i0, 1.0 - t, 0.0) + jnp.where(taps == i0 + 1, t, 0.0)
    return w.astype(dtype)


def grid_sample_points_mxu(
    x: jax.Array,
    points_yx: jax.Array,
    *,
    align_corners: bool = True,
    compute_dtype=None,
) -> jax.Array:
    """Bilinearly sample N points from an NHWC map via two MXU matmuls.

    x: (B, H, W, C); points_yx: (B, N, 2) normalized (y, x) in [-1, 1]
    (clamp beforehand for border semantics; OOB taps contribute zero).
    Returns (B, N, C). Equivalent to ``grid_sample`` restricted to a
    point list, but lowered as S_y @ x @ S_x^T instead of a gather.
    """
    B, H, W, C = x.shape
    dt = compute_dtype or x.dtype
    fy = _unnormalize(points_yx[..., 0].astype(jnp.float32), H, align_corners)
    fx = _unnormalize(points_yx[..., 1].astype(jnp.float32), W, align_corners)
    sy = lerp_weight_matrix(fy, H, dt)  # (B, N, H)
    sx = lerp_weight_matrix(fx, W, dt)  # (B, N, W)
    tmp = jnp.einsum(
        "bnh,bhwc->bnwc", sy, x.astype(dt),
        preferred_element_type=jnp.float32,
    )
    out = jnp.einsum(
        "bnw,bnwc->bnc", sx, tmp.astype(dt),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def grid_sample_nchw(
    x: jax.Array,
    grid: jax.Array,
    *,
    align_corners: bool = True,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Torch-layout convenience wrapper: x (B, C, H, W) -> (B, C, Hg, Wg)."""
    y = grid_sample(
        jnp.transpose(x, (0, 2, 3, 1)),
        grid,
        align_corners=align_corners,
        padding_mode=padding_mode,
    )
    return jnp.transpose(y, (0, 3, 1, 2))
