"""Single-scale eval fast path == materialized resize/softmax/argmax.

The fast path (eval/inference.py:_argmax_resized) replaces the staged
full-plane logits resizes + softmax + prob accumulation with a chunked
resize chain and a running argmax. These tests pin the exactness claims:
cv2 bilinear is channelwise independent (chunking == full plane) and
softmax is strictly monotonic per pixel (argmax unchanged, ties
included).
"""

import numpy as np

from dat_segmentation_tpu.eval.inference import (
    _argmax_resized,
    _np_softmax,
    _resize_probs,
)


def _slow(logits, mid_hw, crop_hw, ori):
    x = _resize_probs(logits, mid_hw)
    if crop_hw is not None:
        x = x[: crop_hw[0], : crop_hw[1]]
    if x.shape[:2] != tuple(ori):
        x = _resize_probs(x, ori)
    return np.argmax(_np_softmax(x), axis=-1).astype(np.int32)


def test_fastpath_matches_materialized_chain():
    rng = np.random.RandomState(0)
    for c in (3, 7, 150):
        logits = rng.randn(13, 17, c).astype(np.float32)
        for mid, crop, ori in (
            ((52, 68), None, (52, 68)),      # exact path, mid == ori
            ((52, 68), None, (91, 61)),      # exact path + ori resize
            ((64, 96), (52, 68), (52, 68)),  # bucket crop, crop == ori
            ((64, 96), (52, 68), (37, 53)),  # bucket crop + ori resize
        ):
            fast = _argmax_resized(
                logits, mid, crop_hw=crop,
                final_hw=None if (crop or mid) == tuple(ori) else ori,
            )
            np.testing.assert_array_equal(fast, _slow(logits, mid, crop, ori))


def test_fastpath_tie_break_matches_argmax():
    # exact ties across chunk boundaries must resolve to the LOWEST class
    # index, like np.argmax over the materialized plane
    logits = np.zeros((4, 4, 9), np.float32)
    logits[..., 2] = 1.0
    logits[..., 7] = 1.0  # tied with class 2, later chunk
    out = _argmax_resized(logits, (8, 8))
    assert (out == 2).all()
