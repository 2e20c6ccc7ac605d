"""Bilinear resize and adaptive average pooling with torch parity.

TPU-native replacements for ``F.interpolate(mode='bilinear')`` and
``nn.AdaptiveAvgPool2d`` used throughout the reference heads
(reference: models/heads/uper_head.py:35-52,104-131, models/segmentor.py:44,
models/utils/dat_blocks.py:190). Resize is a separable 1-D matmul per axis —
it lowers onto the MXU instead of a gather, and is exactly torch's
upsample_bilinear2d for both align_corners settings. Adaptive pooling is a
pair of (out, in) averaging matrices with torch's floor/ceil bin edges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _resize_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) interpolation weights matching torch bilinear."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        if align_corners or in_size == 1:
            m[0, 0] = 1.0
            return m
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = max((i + 0.5) * in_size / out_size - 0.5, 0.0)
        lo = int(np.floor(src))
        lo = min(lo, in_size - 1)
        hi = min(lo + 1, in_size - 1)
        t = src - lo
        m[i, lo] += 1.0 - t
        m[i, hi] += t
    return m


@functools.lru_cache(maxsize=256)
def _resize_matrix_cached(in_size: int, out_size: int, align_corners: bool):
    # cache numpy, not jnp: a jnp constant created during one trace must
    # never be reused in another (UnexpectedTracerError)
    return _resize_matrix(in_size, out_size, align_corners)


def resize_bilinear(
    x: jax.Array, out_hw: tuple[int, int], *, align_corners: bool = False
) -> jax.Array:
    """Bilinear resize of an NHWC tensor to ``out_hw`` (static shape).

    Matches ``F.interpolate(x, size=out_hw, mode='bilinear',
    align_corners=align_corners)`` bit-for-bit in float32.
    """
    B, H, W, C = x.shape
    Ho, Wo = out_hw
    if (H, W) == (Ho, Wo):
        return x
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    mh = jnp.asarray(_resize_matrix_cached(H, Ho, align_corners), compute_dtype)
    mw = jnp.asarray(_resize_matrix_cached(W, Wo, align_corners), compute_dtype)
    y = jnp.einsum("bhwc,oh->bowc", x.astype(compute_dtype), mh)
    y = jnp.einsum("bhwc,ow->bhoc", y, mw)
    return y.astype(x.dtype)


def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) averaging weights with torch adaptive bin edges."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -((-(i + 1) * in_size) // out_size)  # ceil((i+1)*in/out)
        m[i, lo:hi] = 1.0 / (hi - lo)
    return m


@functools.lru_cache(maxsize=256)
def _adaptive_pool_matrix_cached(in_size: int, out_size: int):
    return _adaptive_pool_matrix(in_size, out_size)


def adaptive_avg_pool(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """``nn.AdaptiveAvgPool2d(out_hw)`` for an NHWC tensor."""
    B, H, W, C = x.shape
    Ho, Wo = out_hw
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    mh = jnp.asarray(_adaptive_pool_matrix_cached(H, Ho), compute_dtype)
    mw = jnp.asarray(_adaptive_pool_matrix_cached(W, Wo), compute_dtype)
    y = jnp.einsum("bhwc,oh->bowc", x.astype(compute_dtype), mh)
    y = jnp.einsum("bhwc,ow->bhoc", y, mw)
    return y.astype(x.dtype)


def resize_nearest(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """``F.interpolate(mode='nearest')`` for an NHWC tensor (torch index
    rule: src = floor(dst * in / out)). Used by the FPN neck top-down path."""
    B, H, W, C = x.shape
    Ho, Wo = out_hw
    if (H, W) == (Ho, Wo):
        return x
    rows = (np.arange(Ho) * H // Ho).astype(np.int32)
    cols = (np.arange(Wo) * W // Wo).astype(np.int32)
    return x[:, rows][:, :, cols]


def avg_pool(x: jax.Array, kernel: int, stride: int) -> jax.Array:
    """Non-overlapping/strided average pool (NHWC), torch count_include_pad
    semantics with no padding — used by the ``no_off`` ablation
    (reference: models/utils/dat_blocks.py:165)."""
    window = (1, kernel, kernel, 1)
    strides = (1, stride, stride, 1)
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, window, strides, "VALID"
    )
    return (summed / (kernel * kernel)).astype(x.dtype)
