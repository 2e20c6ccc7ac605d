"""Losses / schedules / optimizer / metrics parity and behavior tests."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dat_segmentation_tpu.train import (
    cross_entropy_loss,
    label_smoothing_cross_entropy,
    segmentation_loss,
    soft_target_cross_entropy,
    warmup_cosine_schedule,
    warmup_poly_schedule,
    StreamingIoU,
    intersect_and_union,
    miou_from_totals,
    topk_accuracy,
)
from dat_segmentation_tpu.train.optim import no_decay_mask


def test_cross_entropy_matches_torch_ignore_index():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 8, 8, 5).astype(np.float32)
    labels = rng.randint(0, 5, (2, 8, 8)).astype(np.int64)
    labels[0, :3] = 255
    ref = F.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels),
        ignore_index=255,
    ).item()
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - ref) < 1e-5


def test_segmentation_loss_aux_weight():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    aux = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, (1, 4, 4)))
    main = cross_entropy_loss(logits, labels)
    auxl = cross_entropy_loss(aux, labels)
    total = segmentation_loss(logits, aux, labels, aux_weight=0.4)
    assert abs(float(total) - (float(main) + 0.4 * float(auxl))) < 1e-6


def test_label_smoothing_matches_torch():
    rng = np.random.RandomState(2)
    logits = rng.randn(16, 10).astype(np.float32)
    labels = rng.randint(0, 10, (16,)).astype(np.int64)
    ref = F.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels), label_smoothing=0.1
    ).item()
    got = float(
        label_smoothing_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), smoothing=0.1
        )
    )
    assert abs(got - ref) < 1e-5


def test_soft_target_ce():
    rng = np.random.RandomState(3)
    logits = rng.randn(4, 6).astype(np.float32)
    t = rng.rand(4, 6).astype(np.float32)
    t /= t.sum(-1, keepdims=True)
    ref = torch.mean(
        torch.sum(
            -torch.from_numpy(t)
            * F.log_softmax(torch.from_numpy(logits), dim=-1),
            dim=-1,
        )
    ).item()
    got = float(soft_target_cross_entropy(jnp.asarray(logits), jnp.asarray(t)))
    assert abs(got - ref) < 1e-6


def test_warmup_poly_schedule_reference_semantics():
    """Matches WarmupPolyLRScheduler (new_train.py:20-50)."""
    sched = warmup_poly_schedule(
        6e-5, 1000, warmup_iters=100, warmup_ratio=1e-6, power=1.0
    )
    assert float(sched(0)) == pytest.approx(6e-5 * 1e-6)
    assert float(sched(50)) == pytest.approx(6e-5 * (1e-6 + (1 - 1e-6) * 0.5))
    assert float(sched(100)) == pytest.approx(6e-5, rel=1e-5)
    assert float(sched(550)) == pytest.approx(6e-5 * 0.5, rel=1e-4)
    assert float(sched(1000)) == pytest.approx(0.0, abs=1e-12)


def test_warmup_cosine_endpoints():
    sched = warmup_cosine_schedule(1e-3, 300, warmup_iters=20, min_lr=1e-5)
    assert float(sched(20)) == pytest.approx(1e-3, rel=1e-5)
    assert float(sched(300)) == pytest.approx(1e-5, rel=1e-3)


def test_miou_streaming_equals_direct():
    rng = np.random.RandomState(4)
    pred = rng.randint(0, 5, (4, 32, 32))
    label = rng.randint(0, 5, (4, 32, 32))
    label[0, :4] = 255
    iou = StreamingIoU(5)
    for i in range(4):
        iou.update(pred[i], label[i])
    # direct
    inter, union, _, _ = intersect_and_union(
        jnp.asarray(pred), jnp.asarray(label), 5
    )
    direct, _ = miou_from_totals(np.asarray(inter), np.asarray(union))
    assert iou.miou() == pytest.approx(direct, abs=1e-9)
    # cross-check one class against numpy
    valid = label != 255
    c0_inter = np.sum((pred == 0) & (label == 0) & valid)
    c0_union = np.sum(((pred == 0) & valid) | ((label == 0) & valid))
    assert iou.inter[0] == c0_inter and iou.union[0] == c0_union


def test_topk_accuracy_mixup_aware():
    logits = jnp.asarray(
        [[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.2, 0.3, 0.5]]
    )
    soft = jnp.asarray([[0.3, 0.7, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    accs = topk_accuracy(logits, soft, ks=(1, 2))
    assert float(accs[1]) == pytest.approx(2 / 3)
    assert float(accs[2]) == pytest.approx(1.0)


def test_no_decay_mask_rules():
    params = {
        "stage_0": {
            "attn_0": {
                "proj_q": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros(4)},
                "rpe_table": jnp.zeros((2, 7, 7)),
            },
            "norm1_0": {"scale": jnp.zeros(4), "bias": jnp.zeros(4)},
        },
        "out_norm_0": {"scale": jnp.zeros(4), "bias": jnp.zeros(4)},
    }
    mask = no_decay_mask(
        params, ("absolute_pos_embed", "relative_position_bias_table",
                 "rpe_table", "norm"),
    )
    assert mask["stage_0"]["attn_0"]["proj_q"]["kernel"]
    # reference-exact: biases DECAY (torch 'proj_q.bias' matches no key —
    # new_train.py:146-160 groups by name substring only)
    assert mask["stage_0"]["attn_0"]["proj_q"]["bias"]
    assert not mask["stage_0"]["attn_0"]["rpe_table"]  # named
    assert not mask["out_norm_0"]["scale"]  # 'norm' in path
    assert not mask["stage_0"]["norm1_0"]["bias"]  # LN bias exempt via name


def test_intersect_and_union_impls_agree():
    """The MXU-reduce ('matmul') histogram must count identically to the
    compare-reduce form, including ignore pixels, out-of-range preds and
    the chunk-padding path (N not a multiple of the scan chunk)."""
    from dat_segmentation_tpu.train.metrics import intersect_and_union

    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.randint(0, 150, (2, 37, 53)))
    label = jnp.asarray(
        np.where(rng.rand(2, 37, 53) < 0.1, 255,
                 rng.randint(0, 150, (2, 37, 53)))
    )
    a = intersect_and_union(pred, label, 150, impl="compare")
    b = intersect_and_union(pred, label, 150, impl="matmul")
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # big-N leg: multiple scan chunks + padding tail
    pred = jnp.asarray(rng.randint(0, 10, (600000,)))
    label = jnp.asarray(rng.randint(0, 10, (600000,)))
    a = intersect_and_union(pred, label, 10, impl="compare")
    b = intersect_and_union(pred, label, 10, impl="matmul")
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
