"""Fused deformable-attention kernel vs the XLA composite (interpret mode
on CPU; the same kernel compiles for real on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dat_segmentation_tpu.ops.pallas.deform_attn import (
    _xla_reference,
    fused_deform_attention,
)


def _inputs(B=2, g=2, h_g=2, hc=16, H=16, W=8, Ns=16, th=15, tw=15, seed=0,
            pos_range=1.0):
    rng = np.random.RandomState(seed)
    Cg = h_g * hc
    q = rng.randn(B * g, H, W, Cg).astype(np.float32) * 0.5
    k = rng.randn(B * g, Ns, Cg).astype(np.float32) * 0.5
    v = rng.randn(B * g, Ns, Cg).astype(np.float32) * 0.5
    pos = rng.uniform(
        -pos_range, pos_range, (B * g, Ns, 2)
    ).astype(np.float32)
    table = rng.randn(g, h_g, th, tw).astype(np.float32) * 0.1
    return map(jnp.asarray, (q, k, v, pos, table))


@pytest.mark.parametrize("version", [1, 2, 3, 4])
@pytest.mark.parametrize(
    "shape",
    [
        dict(),  # base
        dict(H=8, W=16, Ns=25),  # rectangular, odd Ns
        dict(g=1, h_g=4, hc=8),  # single group, more heads
        dict(th=21, tw=9),  # asymmetric table
    ],
)
def test_fused_kernel_matches_xla(shape, version):
    q, k, v, pos, table = _inputs(**shape)
    g = table.shape[0]
    scale = (q.shape[-1] // table.shape[1]) ** -0.5
    ref = _xla_reference(q, k, v, pos, table, n_groups=g, scale=scale)
    got = fused_deform_attention(q, k, v, pos, table, g, scale, True, version)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize(
    "shape",
    [
        dict(B=2, g=1, h_g=2, hc=4, H=8, W=8, Ns=4, th=15, tw=15),
        dict(B=1, g=2, h_g=2, hc=4, H=8, W=16, Ns=9, th=15, tw=15),
        dict(B=2, g=2, h_g=1, hc=8, H=16, W=8, Ns=16, th=31, tw=15),
    ],
)
def test_fused_backward_matches_xla_vjp(shape):
    """The fused Pallas backward emits (dq, dk, dv, dpos, dtable) matching
    the XLA composite's autodiff to f32 precision (interpret mode)."""
    q, k, v, pos, table = _inputs(**shape)
    g = table.shape[0]
    scale = (q.shape[-1] // table.shape[1]) ** -0.5
    dout = jnp.asarray(
        np.random.RandomState(7).randn(*q.shape).astype(np.float32)
    )

    _, vjp_f = jax.vjp(
        lambda *a: fused_deform_attention(*a, g, scale, True, 2, True),
        q, k, v, pos, table,
    )
    _, vjp_x = jax.vjp(
        lambda *a: _xla_reference(*a, n_groups=g, scale=scale),
        q, k, v, pos, table,
    )
    for name, a, b in zip(
        ("dq", "dk", "dv", "dpos", "dtable"), vjp_f(dout), vjp_x(dout)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )


@pytest.mark.parametrize(
    "shape",
    [
        dict(B=1, g=2, h_g=2, hc=8, H=16, W=16, Ns=256, th=13, tw=13),
        dict(B=1, g=2, h_g=2, hc=8, H=16, W=32, Ns=256, th=27, tw=27),
    ],
)
def test_packed_kernel_out_of_range_positions(shape, monkeypatch):
    """pos OUTSIDE [-1, 1] at packed narrow-stage shapes (pack=4/2).

    The module does NOT clamp pos when offset_range_factor >= 0 (the
    schema default), and reference_points itself exceeds the grid at the
    borders — zeros-padding taps from a local fy outside [0, th-1] must
    NOT bleed into the neighboring sample group's K-block (regression:
    unmasked shifted taps corrupted adjacent groups' bias and
    dpos/dtable at 1e-4 level)."""
    monkeypatch.setenv("DAT_TPU_BWD_LAYOUT", "v4")
    # packing is opt-in since the 2026-08-18 v5e measurements; force it
    # here so the block-diag confinement path stays covered
    monkeypatch.setenv("DAT_TPU_M1PACK", "4" if shape["th"] == 13 else "2")
    q, k, v, pos, table = _inputs(pos_range=1.2, **shape)
    g = table.shape[0]
    scale = (q.shape[-1] // table.shape[1]) ** -0.5
    dout = jnp.asarray(
        np.random.RandomState(23).randn(*q.shape).astype(np.float32)
    )
    out_f, vjp_f = jax.vjp(
        lambda *a: fused_deform_attention(*a, g, scale, True, 4, True),
        q, k, v, pos, table,
    )
    out_x, vjp_x = jax.vjp(
        lambda *a: _xla_reference(*a, n_groups=g, scale=scale),
        q, k, v, pos, table,
    )
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), rtol=1e-4, atol=1e-5
    )
    for name, a, b in zip(
        ("dq", "dk", "dv", "dpos", "dtable"), vjp_f(dout), vjp_x(dout)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )


@pytest.mark.parametrize("hw", [(28, 28), (14, 14), (7, 7), (28, 14)])
def test_fused_kernel_padded_shapes(hw):
    """Non-8-aligned (224-classifier) shapes: queries zero-padded to the
    next 8-multiple with true-size coordinate normalization must match
    the unpadded composite exactly on the real rows."""
    H, W = hw
    q, k, v, pos, table = _inputs(H=H, W=W, Ns=16)
    g = table.shape[0]
    scale = (q.shape[-1] // table.shape[1]) ** -0.5
    ref = _xla_reference(q, k, v, pos, table, n_groups=g, scale=scale)
    Hp, Wp = -(-H // 8) * 8, -(-W // 8) * 8
    qp = jnp.pad(q, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    got = fused_deform_attention(
        qp, k, v, pos, table, g, scale, True, 0, True, H, W
    )[:, :H, :W]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("layout", ["v2", "v4"])
@pytest.mark.parametrize(
    "shape",
    [
        dict(B=2, g=1, h_g=2, hc=4, H=8, W=8, Ns=4, th=15, tw=15),
        dict(B=1, g=2, h_g=2, hc=4, H=8, W=16, Ns=9, th=15, tw=15),
    ],
)
def test_fused_backward_layouts_match_xla_vjp(shape, layout, monkeypatch):
    """Both backward layouts (sample-major v2, query-major v4) emit
    gradients matching the composite's autodiff."""
    monkeypatch.setenv("DAT_TPU_BWD_LAYOUT", layout)
    q, k, v, pos, table = _inputs(**shape)
    g = table.shape[0]
    scale = (q.shape[-1] // table.shape[1]) ** -0.5
    dout = jnp.asarray(
        np.random.RandomState(11).randn(*q.shape).astype(np.float32)
    )
    _, vjp_f = jax.vjp(
        lambda *a: fused_deform_attention(*a, g, scale, True, 2, True),
        q, k, v, pos, table,
    )
    _, vjp_x = jax.vjp(
        lambda *a: _xla_reference(*a, n_groups=g, scale=scale),
        q, k, v, pos, table,
    )
    for name, a, b in zip(
        ("dq", "dk", "dv", "dpos", "dtable"), vjp_f(dout), vjp_x(dout)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=f"{layout}:{name}",
        )


@pytest.mark.parametrize(
    "shape",
    [
        # real DAT-T++ narrow-stage geometry (Ns=256): th=13 packs the
        # m1 tap matmuls 4-way, th=27 2-way (_m1_pack block-diag groups)
        dict(B=1, g=2, h_g=2, hc=8, H=16, W=16, Ns=256, th=13, tw=13),
        dict(B=1, g=2, h_g=2, hc=8, H=16, W=32, Ns=256, th=27, tw=27),
    ],
)
def test_fused_backward_packed_stage_shapes(shape, monkeypatch):
    """Query-major fwd+bwd at production narrow-stage shapes, where the
    sample-group K-block packing (pack=2/4) is active (opt-in via
    DAT_TPU_M1PACK since the 2026-08-18 v5e measurements)."""
    monkeypatch.setenv("DAT_TPU_BWD_LAYOUT", "v4")
    monkeypatch.setenv("DAT_TPU_M1PACK", "4" if shape["th"] == 13 else "2")
    q, k, v, pos, table = _inputs(**shape)
    g = table.shape[0]
    scale = (q.shape[-1] // table.shape[1]) ** -0.5
    dout = jnp.asarray(
        np.random.RandomState(17).randn(*q.shape).astype(np.float32)
    )
    out_f, vjp_f = jax.vjp(
        lambda *a: fused_deform_attention(*a, g, scale, True, 4, True),
        q, k, v, pos, table,
    )
    out_x, vjp_x = jax.vjp(
        lambda *a: _xla_reference(*a, n_groups=g, scale=scale),
        q, k, v, pos, table,
    )
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), rtol=1e-4, atol=1e-5
    )
    for name, a, b in zip(
        ("dq", "dk", "dv", "dpos", "dtable"), vjp_f(dout), vjp_x(dout)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )


def test_fused_backward_padded_shapes():
    """Fused backward through padded queries: zero cotangents on pad rows
    must leave every gradient identical to the unpadded composite."""
    H, W = 14, 14
    q, k, v, pos, table = _inputs(H=H, W=W, Ns=16)
    g = table.shape[0]
    scale = (q.shape[-1] // table.shape[1]) ** -0.5
    Hp, Wp = 16, 16

    def fused_sliced(q_, k_, v_, pos_, tbl_):
        qp = jnp.pad(q_, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        out = fused_deform_attention(
            qp, k_, v_, pos_, tbl_, g, scale, True, 0, True, H, W
        )
        return out[:, :H, :W]

    dout = jnp.asarray(
        np.random.RandomState(13).randn(*q.shape).astype(np.float32)
    )
    _, vjp_f = jax.vjp(fused_sliced, q, k, v, pos, table)
    _, vjp_x = jax.vjp(
        lambda *a: _xla_reference(*a, n_groups=g, scale=scale),
        q, k, v, pos, table,
    )
    for name, a, b in zip(
        ("dq", "dk", "dv", "dpos", "dtable"), vjp_f(dout), vjp_x(dout)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )


def test_module_pallas_pads_nonaligned_input():
    """DeformableAttention on a 28x28 feature map (224-classifier stage)
    runs the kernel via pad-to-8 and matches the XLA path."""
    from dat_segmentation_tpu.models.deformable_attention import (
        DeformableAttention,
    )

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 28, 28, 32).astype(np.float32))

    def build(impl):
        return DeformableAttention(
            dim=32, n_heads=4, n_groups=2, stride=2, ksize=5,
            q_size=(28, 28), offset_range_factor=-1.0, use_pe=True,
            kernel_impl=impl,
        )

    m_xla = build("xla")
    variables = m_xla.init(jax.random.PRNGKey(0), x)
    ref = m_xla.apply(variables, x)
    got = build("pallas").apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_fused_kernel_gradients_flow():
    """custom_vjp backward produces grads matching the composite's."""
    q, k, v, pos, table = _inputs(B=1, g=1, h_g=2, hc=8, H=8, W=8, Ns=9,
                                  th=9, tw=9)
    scale = 8 ** -0.5

    def loss_fused(q_, k_, v_, tbl_):
        out = fused_deform_attention(q_, k_, v_, pos, tbl_, 1, scale, True)
        return jnp.sum(out ** 2)

    def loss_ref(q_, k_, v_, tbl_):
        out = _xla_reference(q_, k_, v_, pos, tbl_, n_groups=1, scale=scale)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, table)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, table)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_module_pallas_path_matches_xla_path():
    """DeformableAttention(kernel_impl='pallas') == kernel_impl='xla'."""
    from dat_segmentation_tpu.models.deformable_attention import (
        DeformableAttention,
    )

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))

    def build(impl):
        return DeformableAttention(
            dim=32, n_heads=4, n_groups=2, stride=2, ksize=5,
            q_size=(16, 16), offset_range_factor=-1.0, use_pe=True,
            kernel_impl=impl,
        )

    m_xla = build("xla")
    variables = m_xla.init(jax.random.PRNGKey(0), x)
    ref = m_xla.apply(variables, x)
    got = build("pallas").apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_pallas_path_trains():
    """Gradient step through the pallas forward works (bwd = XLA recompute)."""
    from dat_segmentation_tpu.models.deformable_attention import (
        DeformableAttention,
    )

    m = DeformableAttention(
        dim=16, n_heads=2, n_groups=1, stride=2, ksize=5, q_size=(8, 8),
        offset_range_factor=-1.0, use_pe=True, kernel_impl="pallas",
    )
    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 8, 16), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(m.apply({"params": params}, x) ** 2)

    grads = jax.grad(loss)(variables["params"])
    norms = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0


def test_full_backbone_pallas_matches_xla():
    """Whole DAT backbone with kernel_impl='pallas' == 'xla' (tiny net)."""
    import dataclasses

    from dat_segmentation_tpu.models.dat import DAT

    kw = dict(
        img_size=32, patch_size=4, dim_stem=8, dims=(8, 16, 32, 64),
        depths=(1, 1, 1, 1), heads=(2, 2, 4, 4), groups=(1, 2, 2, 4),
        stage_spec=(("D",), ("D",), ("X",), ("D",)),
        use_pes=(True,) * 4, strides=(8, 4, 2, 1),
        offset_range_factor=(-1, -1, -1, -1), use_dwc_mlps=(True,) * 4,
        use_lpus=(True,) * 4, use_conv_patches=True,
    )
    x = jnp.asarray(np.random.RandomState(5).randn(1, 32, 32, 3), jnp.float32)
    m_xla = DAT(**kw, kernel_impl="xla")
    variables = m_xla.init(jax.random.PRNGKey(0), x)
    ref = m_xla.apply(variables, x)
    got = DAT(**kw, kernel_impl="pallas").apply(variables, x)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("layout,version", [("v2", 2), ("v4", 4)])
def test_nobias_knob_consistent_fwd_bwd(layout, version, monkeypatch):
    """DAT_TPU_KERNEL_NOBIAS=1 must skip the RPE bias in BOTH directions.

    Regression (code-review r3): the fused backwards recomputed the
    softmax WITH the bias and still emitted bias-path gradients, so
    jax.grad returned cotangents of a different function than the nobias
    forward computed and train-step attribution under the knob still
    paid the bias backward. dq/dk/dv must match autodiff of the
    bias-free composite; dpos/dtable (which only enter the kernel via
    the bias) must be exactly zero.
    """
    monkeypatch.setenv("DAT_TPU_KERNEL_NOBIAS", "1")
    monkeypatch.setenv("DAT_TPU_BWD_LAYOUT", layout)
    # stage-3-like geometry so the v4 leg also exercises pack=4
    q, k, v, pos, table = _inputs(
        B=1, g=2, h_g=2, hc=8, H=16, W=16, Ns=256, th=13, tw=13
    )
    g = table.shape[0]
    scale = (q.shape[-1] // table.shape[1]) ** -0.5
    dout = jnp.asarray(
        np.random.RandomState(11).randn(*q.shape).astype(np.float32)
    )

    def nobias_ref(q, k, v):
        BG, H, W, Cg = q.shape
        h_g = table.shape[1]
        hc = Cg // h_g
        qh = q.reshape(BG, H * W, h_g, hc)
        attn = jnp.einsum(
            "bmhc,bnhc->bhmn", qh, k.reshape(BG, -1, h_g, hc),
            preferred_element_type=jnp.float32,
        ) * scale
        p = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "bhmn,bnhc->bmhc", p.astype(v.dtype),
            v.reshape(BG, -1, h_g, hc),
            preferred_element_type=jnp.float32,
        )
        return out.reshape(q.shape).astype(q.dtype)

    out_f, vjp_f = jax.vjp(
        lambda *a: fused_deform_attention(
            *a, g, scale, True, version, True
        ),
        q, k, v, pos, table,
    )
    out_r, vjp_r = jax.vjp(nobias_ref, q, k, v)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_r), rtol=1e-4, atol=1e-5
    )
    dq, dk, dv, dpos, dtable = vjp_f(dout)
    for name, a, b in zip(("dq", "dk", "dv"), (dq, dk, dv), vjp_r(dout)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )
    assert not np.any(np.asarray(dpos)), "dpos must be zero under nobias"
    assert not np.any(np.asarray(dtable)), "dtable must be zero under nobias"


def test_auto_version_lane_alignment():
    """version=0 selection must never pick v3 at widths that are not full
    lane tiles: the v3 (RT, W) flatten is a Mosaic shape cast that is
    only layout-legal at W % 128 == 0. W=176 (the 704-wide eval bucket's
    stage-0) crashed real-TPU compilation with 'unsupported shape cast'
    until the gate was tightened (round 5)."""
    from dat_segmentation_tpu.ops.pallas.deform_attn import auto_version

    assert auto_version(128) == 3
    assert auto_version(256) == 3
    assert auto_version(512) == 3
    # not lane-aligned -> v4 (8-aligned) even though >= 128
    assert auto_version(176) == 4
    assert auto_version(136) == 4
    # narrow 8-aligned -> v4; otherwise v2
    assert auto_version(64) == 4
    assert auto_version(88) == 4
    assert auto_version(44) == 2
    assert auto_version(7) == 2
