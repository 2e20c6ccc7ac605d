"""Gradient checkpointing (nn.remat stages) and stochastic-depth tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from dat_segmentation_tpu.models.dat import DAT
from dat_segmentation_tpu.models.layers import DropPath


def _bb(use_checkpoint):
    return DAT(
        img_size=64,
        patch_size=4,
        dim_stem=16,
        dims=(16, 32, 64, 128),
        depths=(1, 1, 1, 1),
        heads=(2, 2, 4, 4),
        groups=(1, 2, 2, 4),
        stage_spec=(("D",), ("X",), ("D",), ("D",)),
        use_pes=(True,) * 4,
        strides=(8, 4, 2, 1),
        offset_range_factor=(-1, -1, -1, -1),
        use_dwc_mlps=(True,) * 4,
        use_lpus=(True,) * 4,
        use_conv_patches=True,
        drop_path_rate=0.0,
        use_checkpoint=use_checkpoint,
    )


def test_remat_same_values_and_grads():
    """use_checkpoint must change memory, not math (reference wraps stages
    in torch.utils.checkpoint, dat.py:161-165)."""
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    plain = _bb(False)
    remat = _bb(True)
    variables = plain.init(jax.random.PRNGKey(0), x)

    def loss(model, params):
        outs = model.apply(
            {"params": params}, x, deterministic=True, train=True
        )
        return sum(jnp.sum(o ** 2) for o in outs)

    l1, g1 = jax.value_and_grad(lambda p: loss(plain, p))(variables["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(remat, p))(variables["params"])
    assert np.allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_droppath_eval_identity_train_scaling():
    dp = DropPath(0.5)
    x = jnp.ones((64, 4, 4, 8))
    # eval: identity
    out = dp.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    # train: rows either 0 or 1/keep, mean approx preserved
    out = dp.apply(
        {}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)}
    )
    arr = np.asarray(out)
    per_sample = arr.reshape(64, -1)
    uniq = np.unique(per_sample.round(6))
    assert set(uniq).issubset({0.0, 2.0})
    assert 0.3 < (per_sample[:, 0] == 0).mean() < 0.7
