"""Parity of ops.grid_sample / ops.interpolate against torch kernels."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dat_segmentation_tpu.ops import grid_sample, resize_bilinear, adaptive_avg_pool
from dat_segmentation_tpu.ops.grid_sample import grid_sample_nchw
from dat_segmentation_tpu.ops.interpolate import avg_pool


def _rand(shape, seed=0, lo=-1.0, hi=1.0):
    rng = np.random.RandomState(seed)
    return (rng.rand(*shape) * (hi - lo) + lo).astype(np.float32)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("oob", [False, True])
def test_grid_sample_matches_torch(align_corners, padding_mode, oob):
    B, C, H, W = 2, 5, 9, 13
    Hg, Wg = 7, 11
    x = _rand((B, C, H, W), seed=1, lo=-2, hi=2)
    span = 1.6 if oob else 1.0
    grid = _rand((B, Hg, Wg, 2), seed=2, lo=-span, hi=span)

    ref = F.grid_sample(
        torch.from_numpy(x),
        torch.from_numpy(grid),
        mode="bilinear",
        align_corners=align_corners,
        padding_mode=padding_mode,
    ).numpy()

    got = np.asarray(
        grid_sample_nchw(
            x, grid, align_corners=align_corners, padding_mode=padding_mode
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_nhwc_layout():
    B, C, H, W = 1, 3, 6, 6
    x = _rand((B, H, W, C), seed=3)
    grid = _rand((B, 4, 4, 2), seed=4)
    got = np.asarray(grid_sample(x, grid))
    ref = F.grid_sample(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(grid),
        mode="bilinear",
        align_corners=True,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_exact_corners():
    """grid (-1,-1) with align_corners=True must hit pixel (0,0) exactly."""
    x = _rand((1, 4, 5, 2), seed=5)
    grid = np.array([[[[-1.0, -1.0], [1.0, 1.0]]]], dtype=np.float32)
    out = np.asarray(grid_sample(x, grid))
    np.testing.assert_allclose(out[0, 0, 0], x[0, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(out[0, 0, 1], x[0, -1, -1], rtol=1e-6)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("out_hw", [(16, 16), (7, 5), (33, 47), (1, 1)])
def test_resize_bilinear_matches_torch(align_corners, out_hw):
    B, C, H, W = 2, 3, 12, 17
    x = _rand((B, C, H, W), seed=6, lo=-3, hi=3)
    ref = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=align_corners
    ).numpy()
    got = np.asarray(
        resize_bilinear(x.transpose(0, 2, 3, 1), out_hw, align_corners=align_corners)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_resize_upsample_matches_torch():
    # the segmentor's logit upsample: 128x128 -> 512x512, align_corners=False
    x = _rand((1, 4, 16, 16), seed=7)
    ref = F.interpolate(torch.from_numpy(x), size=(64, 64), mode="bilinear").numpy()
    got = np.asarray(
        resize_bilinear(x.transpose(0, 2, 3, 1), (64, 64), align_corners=False)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scale", [1, 2, 3, 6])
@pytest.mark.parametrize("hw", [(16, 16), (13, 17), (7, 7)])
def test_adaptive_avg_pool_matches_torch(scale, hw):
    B, C = 2, 3
    x = _rand((B, C) + hw, seed=8)
    ref = torch.nn.AdaptiveAvgPool2d(scale)(torch.from_numpy(x)).numpy()
    got = np.asarray(
        adaptive_avg_pool(x.transpose(0, 2, 3, 1), (scale, scale))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("k", [2, 4, 8])
def test_avg_pool_matches_torch(k):
    x = _rand((2, 3, 16, 16), seed=9)
    ref = F.avg_pool2d(torch.from_numpy(x), kernel_size=k, stride=k).numpy()
    got = np.asarray(avg_pool(x.transpose(0, 2, 3, 1), k, k)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
