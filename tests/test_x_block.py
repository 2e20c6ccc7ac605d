"""Fused X-block Pallas kernel vs the composite / unfused module path
(interpret mode on CPU; the same kernel compiles for real on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dat_segmentation_tpu.ops.pallas.x_block import (
    _composite,
    fused_x_block,
)


def _params(C=16, E=4, k=7, seed=0, lpu=True):
    rng = np.random.RandomState(seed)
    H4 = C * E

    def t(*s, scale=0.2):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * scale)

    w3 = t(3, 3, 1, C) if lpu else None
    b3 = t(C) if lpu else None
    return dict(
        w3=w3, b3=b3,
        w7=t(k, k, 1, C), b7=t(C),
        g=t(C, scale=1.0) + 1.0, be=t(C),
        wf1=t(C, H4), bf1=t(H4),
        wd=t(3, 3, 1, H4), bd=t(H4),
        wf2=t(H4, C), bf2=t(C),
    )


def _call(fn, x, p, k, lpu, interpret=True):
    return fn(
        x, p["w3"], p["b3"], p["w7"], p["b7"], p["g"], p["be"],
        p["wf1"], p["bf1"], p["wd"], p["bd"], p["wf2"], p["bf2"],
        k, lpu, interpret,
    )


@pytest.mark.parametrize("lpu", [True, False])
@pytest.mark.parametrize(
    "shape",
    [
        dict(B=2, H=16, W=16, C=16, k=7),
        dict(B=1, H=8, W=24, C=8, k=7),   # rectangular
        dict(B=1, H=16, W=8, C=16, k=3),  # small window
        dict(B=1, H=8, W=8, C=8, k=5),
    ],
)
def test_fused_x_block_matches_composite(shape, lpu):
    B, H, W, C, k = (shape[s] for s in "BHWCk")
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5)
    p = _params(C=C, k=k, lpu=lpu)
    ref = _call(
        lambda *a: _composite(*a[:13], k=a[13], with_lpu=a[14]),
        x, p, k, lpu,
    )
    got = _call(fused_x_block, x, p, k, lpu)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


def test_fused_x_block_gradients():
    """custom_vjp backward (composite recompute) produces correct grads."""
    B, H, W, C, k = 1, 8, 8, 8, 7
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5)
    p = _params(C=C, k=k, lpu=True, seed=3)

    def loss_fused(x_, wf1_):
        p2 = dict(p, wf1=wf1_)
        return jnp.sum(_call(fused_x_block, x_, p2, k, True) ** 2)

    def loss_ref(x_, wf1_):
        p2 = dict(p, wf1=wf1_)
        return jnp.sum(
            _call(
                lambda *a: _composite(*a[:13], k=a[13], with_lpu=a[14]),
                x_, p2, k, True,
            )
            ** 2
        )

    g1 = jax.grad(loss_fused, argnums=(0, 1))(x, p["wf1"])
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, p["wf1"])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_stage_fused_matches_unfused():
    """TransformerStage with the fused X path (kernel_impl='pallas',
    interpret on CPU) == the unfused XLA path, same param tree."""
    from dat_segmentation_tpu.models.dat import DAT

    kw = dict(
        img_size=32, patch_size=4, dim_stem=8, dims=(8, 16, 32, 64),
        depths=(2, 1, 1, 1), heads=(2, 2, 4, 4), groups=(1, 2, 2, 4),
        stage_spec=(("X", "X"), ("X",), ("X",), ("D",)),
        use_pes=(True,) * 4, strides=(8, 4, 2, 1),
        offset_range_factor=(-1, -1, -1, -1), use_dwc_mlps=(True,) * 4,
        use_lpus=(True, True, False, True), use_conv_patches=True,
    )
    x = jnp.asarray(
        np.random.RandomState(5).randn(1, 32, 32, 3), jnp.float32
    )
    m_xla = DAT(**kw, kernel_impl="xla")
    variables = m_xla.init(jax.random.PRNGKey(0), x)
    ref = m_xla.apply(variables, x)
    m_fused = DAT(**kw, kernel_impl="pallas")
    # identical param trees: the fused path declares the same names
    v2 = m_fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(
        variables
    )
    got = m_fused.apply(variables, x)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
