"""Inference/eval pipeline tests with a tiny segmentor on CPU."""

import dataclasses
import random
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from dat_segmentation_tpu.configs import get_config
from dat_segmentation_tpu.data.ade20k import ADE20KDataset
from dat_segmentation_tpu.eval import SegInferencer, evaluate_dataset
from dat_segmentation_tpu.eval.evaluate import merge_shard_results
from dat_segmentation_tpu.models import build_model


@pytest.fixture(scope="module")
def tiny_inferencer():
    cfg = get_config("upn_tiny_160k_dp03_lr6")
    bb = dataclasses.replace(
        cfg.model.backbone,
        depths=(1, 1, 1, 1),
        dims=(8, 16, 32, 64),
        dim_stem=8,
        heads=(2, 2, 4, 4),
        groups=(1, 2, 2, 4),
        stage_spec=(("X",), ("D",), ("D",), ("D",)),
        drop_path_rate=0.0,
    )
    model_cfg = dataclasses.replace(
        cfg.model,
        backbone=bb,
        decode_head=dataclasses.replace(
            cfg.model.decode_head, num_classes=20, channels=16
        ),
        auxiliary_head=None,
        num_classes=20,
    )
    model = build_model(model_cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3)),
        train=False,
    )
    return SegInferencer(
        model,
        jax.device_get(variables),
        num_classes=20,
        bucket=64,
        crop_size=(64, 64),
        stride=(48, 48),
        compute_dtype=jnp.float32,
    )


def test_whole_inference_shapes(tiny_inferencer):
    img = np.random.RandomState(0).randn(100, 130, 3).astype(np.float32)
    logits = tiny_inferencer.logits_whole(img)
    assert logits.shape == (100, 130, 20)


def test_slide_equals_whole_on_single_window(tiny_inferencer):
    """One 64x64 window == whole-mode on a 64x64 image.

    Slide batches windows (slide_batch=4, zero-padded slots) so it runs
    a DIFFERENT compiled program than whole's batch-1 forward; under the
    default bf16 compute the two programs' fusion rounding legitimately
    differs at the ~1e-3 level on a small fraction of elements (BN uses
    running stats and LN is per-sample, so batch slots cannot interact
    semantically). Tolerance sized to bf16 cross-program variance;
    argmax must still agree everywhere."""
    img = np.random.RandomState(1).randn(64, 64, 3).astype(np.float32)
    whole = tiny_inferencer.logits_whole(img)
    slide = tiny_inferencer.logits_slide(img)
    np.testing.assert_allclose(slide, whole, rtol=2e-2, atol=2e-3)
    np.testing.assert_array_equal(
        np.argmax(slide, -1), np.argmax(whole, -1)
    )


def test_slide_covers_overlaps(tiny_inferencer):
    img = np.random.RandomState(2).randn(100, 150, 3).astype(np.float32)
    logits = tiny_inferencer.logits_slide(img)
    assert logits.shape == (100, 150, 20)
    assert np.isfinite(logits).all()


def test_tta_predict_deterministic(tiny_inferencer):
    raw = np.random.RandomState(3).randint(0, 255, (90, 120, 3), np.uint8)
    p1 = tiny_inferencer.predict(
        raw, img_scale=(128, 64), ratios=(0.5, 1.0), flip=True
    )
    p2 = tiny_inferencer.predict(
        raw, img_scale=(128, 64), ratios=(0.5, 1.0), flip=True
    )
    assert p1.shape == (90, 120)
    np.testing.assert_array_equal(p1, p2)
    assert p1.min() >= 0 and p1.max() < 20


def _make_val_layout(tmp_path: Path, n=4):
    img_dir = tmp_path / "images" / "validation"
    ann_dir = tmp_path / "annotations" / "validation"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    for i in range(n):
        rs = np.random.RandomState(i)
        img = rs.randint(0, 255, (80 + 7 * i, 100, 3), np.uint8)
        mask = rs.randint(1, 21, (80 + 7 * i, 100)).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"v_{i}.jpg"), img)
        cv2.imwrite(str(ann_dir / f"v_{i}.png"), mask)
    return tmp_path


def test_evaluate_dataset_and_shard_merge(tmp_path, tiny_inferencer):
    root = _make_val_layout(tmp_path)
    ds = ADE20KDataset(root, "val")
    full = evaluate_dataset(
        tiny_inferencer, ds, num_classes=20, img_scale=(128, 64),
        verbose=False,
    )
    assert 0.0 <= full["mIoU"] <= 1.0
    assert full["num_images"] == 4

    shard0 = evaluate_dataset(
        tiny_inferencer, ds, num_classes=20, img_scale=(128, 64),
        shard_info=(0, 2), verbose=False,
    )
    shard1 = evaluate_dataset(
        tiny_inferencer, ds, num_classes=20, img_scale=(128, 64),
        shard_info=(1, 2), verbose=False,
    )
    merged = merge_shard_results([shard0, shard1], num_classes=20)
    assert merged["num_images"] == 4
    assert merged["mIoU"] == pytest.approx(full["mIoU"], abs=1e-12)


def test_batched_eval_matches_per_image(tmp_path, tiny_inferencer):
    """Bucket-batched eval (batch_size>1) matches the per-image loop.

    Semantics are identical (same padded forward, per-image slicing); the
    batch dim reassociates conv float accumulation, so a handful of
    near-tie argmax pixels may flip — counters agree to <1% and mIoU to
    a few 1e-3."""
    root = _make_val_layout(tmp_path, n=6)
    ds = ADE20KDataset(root, "val")
    ref = evaluate_dataset(
        tiny_inferencer, ds, num_classes=20, img_scale=(128, 64),
        batch_size=1, verbose=False,
    )
    got = evaluate_dataset(
        tiny_inferencer, ds, num_classes=20, img_scale=(128, 64),
        batch_size=4, verbose=False,
    )
    assert got["num_images"] == ref["num_images"] == 6
    np.testing.assert_allclose(got["inter"], ref["inter"], rtol=0.01)
    np.testing.assert_allclose(got["union"], ref["union"], rtol=0.01)
    assert got["mIoU"] == pytest.approx(ref["mIoU"], abs=5e-3)


def test_postproc_workers_bitwise_equal(tmp_path, tiny_inferencer):
    """The postproc thread pool only relocates _argmax_resized calls to
    worker threads — counters must be BIT-identical to the sequential
    batched path (same programs, same host math)."""
    root = _make_val_layout(tmp_path, n=6)
    ds = ADE20KDataset(root, "val")
    kw = dict(
        num_classes=20, img_scale=(128, 64), batch_size=4, verbose=False,
    )
    ref = evaluate_dataset(tiny_inferencer, ds, postproc_workers=0, **kw)
    got = evaluate_dataset(tiny_inferencer, ds, postproc_workers=3, **kw)
    assert got["num_images"] == ref["num_images"] == 6
    np.testing.assert_array_equal(got["inter"], ref["inter"])
    np.testing.assert_array_equal(got["union"], ref["union"])
    assert got["mIoU"] == ref["mIoU"]


def test_batched_eval_matches_per_image_tta(tmp_path, tiny_inferencer):
    """Batched eval with multi-scale + flip TTA == per-image TTA."""
    root = _make_val_layout(tmp_path, n=3)
    ds = ADE20KDataset(root, "val")
    kw = dict(
        num_classes=20, img_scale=(128, 64), aug_test=True, verbose=False,
    )
    ref = evaluate_dataset(tiny_inferencer, ds, batch_size=1, **kw)
    got = evaluate_dataset(tiny_inferencer, ds, batch_size=2, **kw)
    np.testing.assert_allclose(got["inter"], ref["inter"], rtol=0.01)
    np.testing.assert_allclose(got["union"], ref["union"], rtol=0.01)
    assert got["mIoU"] == pytest.approx(ref["mIoU"], abs=5e-3)


def test_distributed_reduction_single_process(tmp_path, tiny_inferencer):
    """distributed=True is a no-op reduction on a single process."""
    root = _make_val_layout(tmp_path, n=2)
    ds = ADE20KDataset(root, "val")
    ref = evaluate_dataset(
        tiny_inferencer, ds, num_classes=20, img_scale=(128, 64),
        verbose=False,
    )
    got = evaluate_dataset(
        tiny_inferencer, ds, num_classes=20, img_scale=(128, 64),
        distributed=True, verbose=False,
    )
    assert got["mIoU"] == pytest.approx(ref["mIoU"], abs=1e-12)
    assert got["num_images"] == ref["num_images"]


def test_stride4_host_upsample_matches_device_path(tiny_inferencer):
    """The inferencer's stride-4 + host-resize logits must match running
    the model with its own device upsample (the resize is linear)."""
    import jax
    import jax.numpy as jnp

    img = np.random.RandomState(7).randn(64, 64, 3).astype(np.float32)
    got = tiny_inferencer.logits_whole(img)

    full = tiny_inferencer.model.apply(
        tiny_inferencer.variables, jnp.asarray(img[None]), train=False,
        upsample=True,
    )
    ref = np.asarray(full)[0]
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
