"""Core building blocks shared across the DAT model family.

NHWC equivalents of the reference's block zoo (reference:
models/utils/dat_blocks.py:229-348, models/backbones/dat.py:22-31). Because
activations are NHWC, the reference's ``LayerNormProxy`` rearrange dance
collapses to a plain LayerNorm over the trailing channel axis, and every
1x1 conv becomes a Dense that feeds the MXU directly.

All GELUs are exact (erf-based) to match torch ``nn.GELU`` — flax's default
tanh approximation drifts ~1e-3 per block and compounds over 26 blocks.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# torch-default initializers (reference modules rely on torch's implicit
# kaiming-uniform init; reference reset_parameters at dat.py:280-285 iterates
# Tensors, never matches nn.Conv2d, and is a silent no-op)
# ---------------------------------------------------------------------------


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """kaiming_uniform(a=sqrt(5)) on an HWIO conv kernel (torch Conv2d default)."""
    kh, kw, in_c, out_c = shape
    fan_in = kh * kw * in_c
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_dense_kernel_init(key, shape, dtype=jnp.float32):
    in_c, out_c = shape
    bound = math.sqrt(1.0 / in_c) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def trunc_normal_init(std: float = 0.02):
    """timm trunc_normal_: N(0, std) truncated to [-2std, 2std]."""

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


def gelu(x: jax.Array) -> jax.Array:
    return nn.gelu(x, approximate=False)


class _DepthwiseShiftConv(nn.Module):
    """Depthwise conv as k*k shifted multiply-adds (stride 1).

    XLA lowers ``conv_general_dilated`` with ``feature_group_count=C`` to
    1-channel-per-group MXU work that wastes almost the whole systolic
    array; expressed as shifted elementwise FMAs it becomes one fused
    VPU loop over a padded input — the op is bandwidth-bound either way,
    but this form reads/writes each activation once. Parameters are laid
    out exactly like ``nn.Conv(feature_group_count=C)`` — kernel
    (kh, kw, 1, C), bias (C,) — so checkpoint trees are unchanged.
    """

    kernel: int
    padding: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, pad = self.kernel, self.padding
        C = x.shape[-1]
        w = self.param("kernel", torch_conv_kernel_init, (k, k, 1, C))
        w = w.astype(x.dtype)
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        H = x.shape[1] + 2 * pad - (k - 1)
        W = x.shape[2] + 2 * pad - (k - 1)
        out = None
        for di in range(k):
            for dj in range(k):
                term = xp[:, di : di + H, dj : dj + W, :] * w[di, dj, 0]
                out = term if out is None else out + term
        if self.use_bias:
            b = self.param("bias", torch_bias_init(k * k), (C,))
            out = out + b.astype(x.dtype)
        return out


def conv2d(
    x: jax.Array,
    features: int,
    kernel: int,
    *,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
    use_bias: bool = True,
    name: str,
) -> jax.Array:
    """NHWC conv with torch-style int padding and torch-default init.

    A helper (not a module) so the parameters land flat under ``name`` in
    the caller's scope — keeps checkpoint trees 1:1 with torch state_dicts.
    ``groups=features`` gives a depthwise conv; ``kernel=1`` is an MXU matmul.
    Stride-1 depthwise convs route to the shift-FMA form (see
    ``_DepthwiseShiftConv``); set DAT_TPU_DWCONV=conv to force the XLA
    grouped-conv lowering.

    Under exact padded inference (ops/valid_extent.py) the input and
    output are zeroed beyond the per-sample valid extent, so conv
    windows near the true border read exactly the zeros that SAME
    padding would produce at the exact (unpadded) shape; the output
    extent follows the conv's own k/s/p arithmetic and is registered
    for downstream ops.
    """
    in_c = x.shape[-1]
    fan_in = kernel * kernel * (in_c // groups)
    import os

    from ..ops import valid_extent as _ve

    ctx = _ve.current()
    ext_out = None
    if ctx is not None:
        ext_in = ctx.get(x.shape[1:3])
        if ext_in is not None:
            x = _ve.mask_tensor(x, ext_in)
            ext_out = _ve.conv_out_extent(ext_in, kernel, stride, padding)

    def _finish(out):
        if ext_out is not None:
            ctx.register(out.shape[1:3], ext_out)
            out = _ve.mask_tensor(out, ext_out)
        return out

    # Measured on v5e (all-X ablation, b8 512²): XLA's native grouped-conv
    # lowering runs the depthwise chain at 24.8 ms vs 30.3 ms for the
    # shift-FMA form — the VPU tap arithmetic dominates either way and
    # XLA's conv emitter wins. shift stays as an opt-in experiment.
    if (
        groups == features == in_c
        and stride == 1
        and padding == kernel // 2
        and os.environ.get("DAT_TPU_DWCONV", "conv") == "shift"
    ):
        return _finish(
            _DepthwiseShiftConv(
                kernel=kernel, padding=padding, use_bias=use_bias, name=name
            )(x)
        )
    return _finish(
        nn.Conv(
            features=features,
            kernel_size=(kernel, kernel),
            strides=(stride, stride),
            padding=[(padding, padding)] * 2,
            feature_group_count=groups,
            use_bias=use_bias,
            kernel_init=torch_conv_kernel_init,
            bias_init=torch_bias_init(fan_in),
            name=name,
        )(x)
    )


def dense(
    x: jax.Array, features: int, *, use_bias: bool = True, name: str
) -> jax.Array:
    """Dense over the trailing axis (== 1x1 conv on NHWC), torch init."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=torch_dense_kernel_init,
        bias_init=torch_bias_init(x.shape[-1]),
        name=name,
    )(x)


class ConvParams(nn.Module):
    """Declares an ``nn.Conv``-compatible parameter pair (kernel HWIO,
    bias) WITHOUT running the conv — used by fused Pallas paths that need
    raw weights while keeping the checkpoint tree identical to the
    unfused modules."""

    features: int
    kernel: int
    in_features: int
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.kernel
        ic = self.in_features // self.groups
        fan_in = k * k * ic
        w = self.param("kernel", torch_conv_kernel_init, (k, k, ic, self.features))
        b = (
            self.param("bias", torch_bias_init(fan_in), (self.features,))
            if self.use_bias
            else None
        )
        return w, b


class DenseParams(nn.Module):
    """``nn.Dense``-compatible parameter pair (see ConvParams)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        w = self.param(
            "kernel", torch_dense_kernel_init, (self.in_features, self.features)
        )
        b = self.param("bias", torch_bias_init(self.in_features), (self.features,))
        return w, b


class LayerNormParams(nn.Module):
    """``LayerNorm2d``-compatible (scale, bias) declaration."""

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.features,)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class ConvMlpParams(nn.Module):
    """``ConvMlp``-compatible parameter tree (fc1 / dwc / fc2)."""

    dim: int
    expansion: int = 4

    @nn.compact
    def __call__(self):
        hidden = self.dim * self.expansion
        fc1 = DenseParams(hidden, self.dim, name="fc1")()
        dwc = ConvParams(hidden, 3, hidden, groups=hidden, name="dwc")()
        fc2 = DenseParams(self.dim, hidden, name="fc2")()
        return fc1, dwc, fc2


class LayerNorm2d(nn.Module):
    """LayerNorm over the channel axis of an NHWC tensor.

    Equivalent to the reference's ``LayerNormProxy`` (dat_blocks.py:229-240)
    without the NCHW<->NHWC rearranges. eps matches torch (1e-5); statistics
    in float32 regardless of activation dtype.
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        # DAT_TPU_LN_BF16=1: dtype-native statistics — a measured probe at
        # the train-step VPU floor (the LN fwd+bwd chain upcasts to f32 by
        # default; on the f32-ALU VPU the saving is expected ~nil, but the
        # attempt is recorded either way in docs/ROOFLINE.md §4). Parity
        # configs keep the f32 default.
        import os

        if os.environ.get("DAT_TPU_LN_BF16") == "1":
            xs = x
        else:
            xs = x.astype(jnp.float32)
        mean = jnp.mean(xs, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xs - mean), axis=-1, keepdims=True)
        y = (xs - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return (y * scale.astype(y.dtype) + bias.astype(y.dtype)).astype(dtype)


def batch_norm(
    x: jax.Array, *, use_running_average: bool, name: str
) -> jax.Array:
    """torch-default BatchNorm (momentum 0.1 -> flax 0.9, eps 1e-5).

    Under pjit with a sharded batch axis, the batch statistics are global
    (GSPMD inserts the cross-replica reduction), so this is SyncBN for free
    — the reference needed NCCL SyncBN for the same effect
    (configs/_base_/models/upernet_dat.py:2).
    """
    return nn.BatchNorm(
        use_running_average=use_running_average,
        momentum=0.9,
        epsilon=1e-5,
        dtype=x.dtype,
        name=name,
    )(x)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm semantics: keep-prob rescaling)."""

    rate: float
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: Optional[bool] = None):
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        )
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class LayerScale(nn.Module):
    """Per-channel learnable gamma (reference: dat.py:22-31)."""

    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param(
            "gamma",
            lambda key, shape: jnp.full(shape, self.init_value, jnp.float32),
            (x.shape[-1],),
        )
        return x * gamma


class Mlp(nn.Module):
    """Token MLP (reference ``TransformerMLP``, dat_blocks.py:244-265)."""

    expansion: int = 4
    drop: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        dim = x.shape[-1]
        x = dense(x, dim * self.expansion, name="fc1")
        x = gelu(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = dense(x, dim, name="fc2")
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class ConvMlp(nn.Module):
    """DWConv MLP used by DAT++ (``use_dwc_mlps``; reference
    ``TransformerMLPWithConv``, dat_blocks.py:316-348): 1x1 up-proj, residual
    3x3 depthwise, GELU, 1x1 down-proj."""

    expansion: int = 4
    drop: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        dim = x.shape[-1]
        hidden = dim * self.expansion
        x = dense(x, hidden, name="fc1")
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = x + conv2d(x, hidden, 3, padding=1, groups=hidden, name="dwc")
        x = gelu(x)
        x = dense(x, dim, name="fc2")
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class CmtConvMlp(nn.Module):
    """CMT-style conv MLP with BatchNorms (reference
    ``TransformerMLPWithConv_CMT``, dat_blocks.py:280-313)."""

    expansion: int = 4
    drop: float = 0.0

    @nn.compact
    def __call__(
        self, x: jax.Array, *, deterministic: bool = True, train: bool = False
    ) -> jax.Array:
        dim = x.shape[-1]
        hidden = dim * self.expansion
        x = dense(x, hidden, name="fc1")
        x = gelu(x)
        x = batch_norm(x, use_running_average=not train, name="bn1")
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = x + conv2d(x, hidden, 3, padding=1, groups=hidden, name="dwc")
        x = gelu(x)
        x = batch_norm(x, use_running_average=not train, name="bn2")
        x = dense(x, dim, name="fc2")
        x = batch_norm(x, use_running_average=not train, name="bn3")
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x
