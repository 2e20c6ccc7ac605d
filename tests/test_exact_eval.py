"""Exact padded inference == exact-shape forward (whole-mode parity).

mmseg ``mode='whole'`` runs the exact resized (H, W) image (reference
configs/_base_/datasets/ade20k.py:20-34 has no Pad step). Our eval pads
to bucket multiples for static XLA shapes; ``valid_hw`` (exact padded
inference, ops/valid_extent.py) must make the padded forward equal the
unpadded one on every sample's valid region — these tests are the gate.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dat_segmentation_tpu.configs import get_config
from dat_segmentation_tpu.models import build_model


def _tiny_model(config="upn_tiny_160k_dp03_lr6", **bb_over):
    cfg = get_config(config).model
    bb = dataclasses.replace(
        cfg.backbone,
        depths=(1, 1, 2, 1),
        dims=(16, 32, 64, 128),
        dim_stem=16,
        heads=(2, 2, 4, 4),
        groups=(1, 2, 2, 4),
        stage_spec=(("D",), ("X", "D"), ("X", "D"), ("D",)),
        drop_path_rate=0.0,
        **bb_over,
    )
    cfg = dataclasses.replace(cfg, backbone=bb)
    return build_model(cfg)


def _stride4_extent(h, w, conv_stem=True):
    if conv_stem:  # two k3 s2 p1 convs
        f = lambda n: (n - 1) // 2 + 1
        return f(f(h)), f(f(w))
    return h // 4, w // 4


def _run_pair(model, variables, shape, pad_hw, rng):
    """Exact forward at ``shape`` vs padded forward with valid_hw."""
    h, w = shape
    hp, wp = pad_hw
    img = rng.randn(1, h, w, 3).astype(np.float32)
    exact = model.apply(
        variables, jnp.asarray(img), train=False, upsample=False
    )
    padded = np.zeros((1, hp, wp, 3), np.float32)
    padded[:, :h, :w] = img
    got = model.apply(
        variables,
        jnp.asarray(padded),
        train=False,
        upsample=False,
        valid_hw=jnp.asarray([[h, w]], jnp.int32),
    )
    eh, ew = _stride4_extent(h, w)
    assert exact.shape[1:3] == (eh, ew), (exact.shape, (eh, ew))
    return np.asarray(exact)[0], np.asarray(got)[0, :eh, :ew]


SHAPES = [(52, 76), (61, 64), (64, 96)]
PAD = (64, 96)


@pytest.mark.parametrize("shape", SHAPES)
def test_upernet_exact_padded_matches_unpadded(shape):
    model = _tiny_model()
    x0 = jnp.zeros((1, *PAD, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    a, b = _run_pair(model, variables, shape, PAD, np.random.RandomState(1))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_fpn_exact_padded_matches_unpadded():
    model = _tiny_model("fpn_tiny_80k_dp04_lr2")
    x0 = jnp.zeros((1, *PAD, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    a, b = _run_pair(
        model, variables, (52, 76), PAD, np.random.RandomState(2)
    )
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_exact_mixed_batch():
    """Two different true shapes in ONE padded batch, each equal to its
    own exact-shape forward."""
    model = _tiny_model()
    x0 = jnp.zeros((1, *PAD, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    rng = np.random.RandomState(3)
    shapes = [(52, 76), (61, 64)]
    imgs = [rng.randn(1, h, w, 3).astype(np.float32) for h, w in shapes]
    padded = np.zeros((2, *PAD, 3), np.float32)
    for i, ((h, w), im) in enumerate(zip(shapes, imgs)):
        padded[i, :h, :w] = im[0]
    got = model.apply(
        variables,
        jnp.asarray(padded),
        train=False,
        upsample=False,
        valid_hw=jnp.asarray(shapes, jnp.int32),
    )
    for i, ((h, w), im) in enumerate(zip(shapes, imgs)):
        exact = model.apply(
            variables, jnp.asarray(im), train=False, upsample=False
        )
        eh, ew = _stride4_extent(h, w)
        np.testing.assert_allclose(
            np.asarray(exact)[0],
            np.asarray(got)[i, :eh, :ew],
            rtol=1e-4,
            atol=1e-4,
            err_msg=f"sample {i} shape {(h, w)}",
        )


@pytest.mark.parametrize(
    "bb_over",
    [
        dict(offset_range_factor=(2.0, 2.0, 2.0, 2.0)),   # tanh-scaled
        dict(no_offs=(True,) * 4),                        # avg-pool kv
        dict(log_cpb=(True,) * 4),                        # Swin-V2 bias
        dict(dwc_pes=(True,) * 4, use_pes=(True,) * 4),   # dwc PE
        dict(fixed_pes=(True,) * 4),                      # fixed bias table
    ],
)
def test_exact_attention_variants(bb_over):
    model = _tiny_model(**bb_over)
    x0 = jnp.zeros((1, *PAD, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    # no_off pools with stride: keep true sizes stride-divisible at every
    # stage for the exact run (the reference asserts the same)
    shape = (64, 64) if bb_over.get("no_offs") else (52, 76)
    pad = (64, 96) if shape != (64, 64) else (96, 96)
    a, b = _run_pair(model, variables, shape, pad, np.random.RandomState(4))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_inferencer_exact_bucket_matches_unpadded():
    """SegInferencer whole-mode: bucket-padded + exact == bucket=1
    (one compile per shape, truly unpadded) — the end-to-end eval-path
    gate for mmseg whole-mode parity."""
    from dat_segmentation_tpu.eval.inference import SegInferencer

    model = _tiny_model()
    x0 = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    kw = dict(compute_dtype=jnp.float32, transfer_dtype=jnp.float32)
    inf_pad = SegInferencer(model, variables, bucket=32, exact=True, **kw)
    inf_ref = SegInferencer(model, variables, bucket=1, exact=True, **kw)
    assert inf_pad.exact
    rng = np.random.RandomState(7)
    img = rng.randn(52, 76, 3).astype(np.float32)
    got = inf_pad.logits_whole(img)
    ref = inf_ref.logits_whole(img)  # (hb,wb)==(h,w): plain unpadded fwd
    assert got.shape == ref.shape and got.shape[:2] == (52, 76)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    # batched path (forward_batch + true-extent slicing, as evaluate.py)
    padded = np.zeros((2, 64, 96, 3), np.float32)
    padded[0, :52, :76] = img
    img2 = rng.randn(61, 64, 3).astype(np.float32)
    padded[1, :61, :64] = img2
    small = inf_pad.forward_batch(
        padded, valid_hw=np.array([[52, 76], [61, 64]], np.int32)
    )
    for i, im in enumerate((img, img2)):
        h, w = im.shape[:2]
        eh, ew = inf_pad._ext4((h, w))
        ref_i = inf_ref.forward_batch(im[None].copy())
        np.testing.assert_allclose(
            small[i, :eh, :ew], ref_i[0], rtol=1e-4, atol=1e-4,
            err_msg=f"batched sample {i}",
        )


def test_exact_requires_upsample_false():
    model = _tiny_model()
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    with pytest.raises(ValueError):
        model.apply(
            variables, x0, train=False,
            valid_hw=jnp.asarray([[52, 52]], jnp.int32),
        )
