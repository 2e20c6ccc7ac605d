"""Per-sample valid-extent propagation for exact padded inference.

mmseg ``mode='whole'`` runs the network on the EXACT resized (H, W)
image (the reference test pipeline has no Pad step,
reference: configs/_base_/datasets/ade20k.py:20-34), while this framework
pads val images up to bucket multiples so XLA compiles a bounded number
of static programs. Zero padding alone deviates from the exact forward
(measured: 0.7-1.3% of argmax pixels flip at bucket=32 on random
weights, tools/bench_pad_deviation.py) because three op families see
the PADDED extent instead of the true one:

  1. spatial convolutions — windows near the true border must read the
     zeros that SAME padding would produce at the exact shape, and the
     pad region re-fills with non-zero junk after every bias/LayerNorm;
  2. anything normalized over the feature size — deformable-attention
     reference/query grids, tanh offset ranges, bilinear/nearest resize
     ratios, adaptive-pool bin edges;
  3. global reductions — softmax over sampled kv points, PPM pooling.

This module makes the padded forward EXACTLY equal to the unpadded one
(up to float associativity) while keeping every shape static:

* an ``ExtentMap`` context maps padded spatial shapes -> traced per-
  sample ``(B, 2)`` valid extents, seeded with the image's true (h, w)
  and grown by each conv as data flows (the conv's own k/s/p arithmetic
  reproduces the exact run's shape arithmetic, so extents never need a
  central registry of the architecture);
* ``conv2d`` (models/layers.py) consults the context: it zeroes its
  input and output beyond the valid extent — restoring the invariant
  that every spatial-mixing op reads zeros where the exact run's SAME
  padding would;
* grids/resizes/pools get traced-extent variants here (weight matrices
  built from iota comparisons — everything stays MXU matmuls);
* attention masks invalid kv columns out of the softmax
  (models/deformable_attention.py).

The context is only entered by ``EncoderDecoder.__call__(valid_hw=...)``
— training and benchmark paths never pay for any of this.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

_CTX: contextvars.ContextVar[Optional["ExtentMap"]] = contextvars.ContextVar(
    "dat_tpu_valid_extent", default=None
)


class ExtentMap:
    """Padded spatial shape -> per-sample valid extent ``(B, 2)`` int32.

    Keys are padded (H, W) tuples. In this architecture every tensor at
    a given padded resolution has the same valid extent (all resolutions
    derive from the image via the same conv arithmetic; the kv grids of
    all four stages coincide with the stage-3 extent because
    ``floor((e-1)/(2s))+1`` composes), so a single dict is unambiguous.
    Registration keeps the first writer (the upstream producer).
    """

    def __init__(self, image_hw: Tuple[int, int], valid_hw: jax.Array):
        assert valid_hw.ndim == 2 and valid_hw.shape[1] == 2, valid_hw.shape
        self._m: Dict[Tuple[int, int], jax.Array] = {
            (int(image_hw[0]), int(image_hw[1])): valid_hw.astype(jnp.int32)
        }

    def get(self, hw) -> Optional[jax.Array]:
        return self._m.get((int(hw[0]), int(hw[1])))

    def register(self, hw, ext: jax.Array) -> None:
        self._m.setdefault((int(hw[0]), int(hw[1])), ext)


def current() -> Optional[ExtentMap]:
    return _CTX.get()


@contextlib.contextmanager
def exact_extent(image_hw: Tuple[int, int], valid_hw: jax.Array):
    """Enter exact-inference mode for the enclosed (traced) forward."""
    token = _CTX.set(ExtentMap(image_hw, valid_hw))
    try:
        yield
    finally:
        _CTX.reset(token)


@contextlib.contextmanager
def suspend():
    """Temporarily disable extent masking (for ops on fully-valid small
    maps, e.g. PPM pooled outputs, whose tiny shapes could collide with
    registered feature-map keys)."""
    token = _CTX.set(None)
    try:
        yield
    finally:
        _CTX.reset(token)


# ---------------------------------------------------------------------------
# extent arithmetic + masking
# ---------------------------------------------------------------------------


def conv_out_extent(ext: jax.Array, kernel: int, stride: int, padding: int):
    """Exact-run conv output extent: floor((e + 2p - k)/s) + 1, >= 1."""
    return jnp.maximum(ext + 2 * padding - kernel, 0) // stride + 1


def stride4_extent(hw, conv_stem: bool, patch_size: int = 4):
    """Host-side stride-4 (stem output = head logits) extent for true
    image size ``hw`` — the same k/s/p arithmetic the stem's convs apply
    (models/dat.py stem; conv stem = two k3 s2 p1 convs, patch stem =
    one k=s=patch_size conv). Works on ints or numpy arrays."""
    import numpy as np

    e = np.asarray(hw)
    if conv_stem:
        s = patch_size // 2
        e = (e + 2 - 3) // s + 1
        e = (e + 2 - 3) // s + 1
    else:
        e = (e - patch_size) // patch_size + 1
    return e


def mask_for(hw: Tuple[int, int], ext: jax.Array, dtype) -> jax.Array:
    """(B, H, W, 1) {0,1} mask of the valid region."""
    H, W = int(hw[0]), int(hw[1])
    rows = jnp.arange(H, dtype=jnp.int32)[None, :] < ext[:, 0:1]  # (B, H)
    cols = jnp.arange(W, dtype=jnp.int32)[None, :] < ext[:, 1:2]  # (B, W)
    return (rows[:, :, None] & cols[:, None, :])[..., None].astype(dtype)


def mask_tensor(x: jax.Array, ext: jax.Array) -> jax.Array:
    """Zero an NHWC tensor beyond the per-sample valid extent.

    Accepts grouped tensors whose batch is ``B*g`` against a ``(B, 2)``
    extent: extents are repeated sample-major (``jnp.repeat(ext, g)``),
    matching how the attention module expands per-sample grids to
    groups (x.reshape(B, H, W, g, Cg).transpose(0, 3, ...) is
    sample-major too)."""
    b, eb = x.shape[0], ext.shape[0]
    if b != eb:
        assert b % eb == 0, (b, eb)
        ext = jnp.repeat(ext, b // eb, axis=0)
    return x * mask_for(x.shape[1:3], ext, x.dtype)


# ---------------------------------------------------------------------------
# traced-extent resize / pooling (per-sample weight-matrix forms of the
# static helpers in ops/interpolate.py — identical math, but the sizes in
# the interpolation formulas are traced per-sample extents)
# ---------------------------------------------------------------------------


def _axis_resize_matrix(
    pad_in: int,
    pad_out: int,
    in_ext: jax.Array,   # (B,) int32 true source size
    out_ext: jax.Array,  # (B,) int32 true destination size
    align_corners: bool,
) -> jax.Array:
    """(B, pad_out, pad_in) bilinear weights matching torch interpolate
    at the TRUE sizes; rows >= out_ext are zero, columns >= in_ext are
    never referenced (so padded-region junk cannot leak in)."""
    i = jnp.arange(pad_out, dtype=jnp.float32)[None, :]  # (1, O)
    s = in_ext.astype(jnp.float32)[:, None]              # (B, 1)
    d = out_ext.astype(jnp.float32)[:, None]
    if align_corners:
        src = i * (s - 1.0) / jnp.maximum(d - 1.0, 1.0)
    else:
        src = jnp.maximum((i + 0.5) * s / d - 0.5, 0.0)
    lo = jnp.minimum(jnp.floor(src), s - 1.0)
    hi = jnp.minimum(lo + 1.0, s - 1.0)
    t = src - lo
    cols = jnp.arange(pad_in, dtype=jnp.float32)[None, None, :]
    m = jnp.where(cols == lo[..., None], 1.0 - t[..., None], 0.0) + jnp.where(
        cols == hi[..., None], t[..., None], 0.0
    )
    valid_row = (
        jnp.arange(pad_out, dtype=jnp.int32)[None, :] < out_ext[:, None]
    )
    return m * valid_row[..., None].astype(m.dtype)


def resize_bilinear_extent(
    x: jax.Array,
    out_hw: Tuple[int, int],
    src_ext: jax.Array,   # (B, 2)
    dst_ext: jax.Array,   # (B, 2)
    *,
    align_corners: bool = False,
) -> jax.Array:
    """Bilinear resize to padded ``out_hw`` with TRUE-size interpolation
    ratios; output zero beyond ``dst_ext``."""
    B, H, W, C = x.shape
    Ho, Wo = int(out_hw[0]), int(out_hw[1])
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    mh = _axis_resize_matrix(H, Ho, src_ext[:, 0], dst_ext[:, 0], align_corners)
    mw = _axis_resize_matrix(W, Wo, src_ext[:, 1], dst_ext[:, 1], align_corners)
    y = jnp.einsum(
        "bhwc,boh->bowc", x.astype(compute_dtype), mh.astype(compute_dtype)
    )
    y = jnp.einsum("bhwc,bow->bhoc", y, mw.astype(compute_dtype))
    return y.astype(x.dtype)


def _axis_nearest_matrix(
    pad_in: int, pad_out: int, in_ext: jax.Array, out_ext: jax.Array
) -> jax.Array:
    """One-hot (B, pad_out, pad_in) with torch nearest semantics
    (src = floor(dst * in / out)) at the true sizes."""
    i = jnp.arange(pad_out, dtype=jnp.int32)[None, :]
    src = i * in_ext[:, None] // jnp.maximum(out_ext[:, None], 1)
    src = jnp.minimum(src, jnp.maximum(in_ext[:, None] - 1, 0))
    cols = jnp.arange(pad_in, dtype=jnp.int32)[None, None, :]
    m = (cols == src[..., None]).astype(jnp.float32)
    valid_row = i < out_ext[:, None]
    return m * valid_row[..., None].astype(m.dtype)


def resize_nearest_extent(
    x: jax.Array,
    out_hw: Tuple[int, int],
    src_ext: jax.Array,
    dst_ext: jax.Array,
) -> jax.Array:
    B, H, W, C = x.shape
    Ho, Wo = int(out_hw[0]), int(out_hw[1])
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    mh = _axis_nearest_matrix(H, Ho, src_ext[:, 0], dst_ext[:, 0])
    mw = _axis_nearest_matrix(W, Wo, src_ext[:, 1], dst_ext[:, 1])
    y = jnp.einsum(
        "bhwc,boh->bowc", x.astype(compute_dtype), mh.astype(compute_dtype)
    )
    y = jnp.einsum("bhwc,bow->bhoc", y, mw.astype(compute_dtype))
    return y.astype(x.dtype)


def _axis_adaptive_pool_matrix(
    pad_in: int, out_size: int, in_ext: jax.Array
) -> jax.Array:
    """(B, out_size, pad_in) torch adaptive-avg-pool weights over the
    TRUE input size (bin edges floor(i*e/o) .. ceil((i+1)*e/o))."""
    i = jnp.arange(out_size, dtype=jnp.int32)[None, :]
    e = in_ext[:, None]
    lo = i * e // out_size
    hi = -((-(i + 1) * e) // out_size)  # ceil
    r = jnp.arange(pad_in, dtype=jnp.int32)[None, None, :]
    inside = (r >= lo[..., None]) & (r < hi[..., None])
    return inside.astype(jnp.float32) / jnp.maximum(
        (hi - lo)[..., None], 1
    ).astype(jnp.float32)


def adaptive_avg_pool_extent(
    x: jax.Array, out_hw: Tuple[int, int], src_ext: jax.Array
) -> jax.Array:
    """``nn.AdaptiveAvgPool2d(out_hw)`` over the per-sample TRUE extent.
    The output is fully valid (no padding): bins never reach past the
    true extent, so padded-region junk never enters a bin."""
    B, H, W, C = x.shape
    Ho, Wo = int(out_hw[0]), int(out_hw[1])
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    mh = _axis_adaptive_pool_matrix(H, Ho, src_ext[:, 0])
    mw = _axis_adaptive_pool_matrix(W, Wo, src_ext[:, 1])
    y = jnp.einsum(
        "bhwc,boh->bowc", x.astype(compute_dtype), mh.astype(compute_dtype)
    )
    y = jnp.einsum("bhwc,bow->bhoc", y, mw.astype(compute_dtype))
    return y.astype(x.dtype)
