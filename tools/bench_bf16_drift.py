"""Quantify bf16-vs-fp16 EXECUTION drift at the mIoU level (VERDICT r4 #3).

The last named parity risk without real checkpoints: our TPU stack
evaluates in bf16 while the reference evaluates fp32 (or fp16 via mmcv
wrap_fp16_model, tools/test.py:220-222). Activation-level parity is
proven at 1e-7 in f32 (tests/test_full_scale_parity.py); this tool
measures what the REDUCED-precision execution does to the metric itself.

Protocol: one set of random weights through the identical eval pipeline
(keep-ratio resize -> whole-mode exact inference -> softmax-resize ->
argmax -> mIoU) over a mixed-shape synthetic val set, in four
executions:

  ours-f32 (semantics anchor; == torch-f32 to <1e-4,
            tests/test_e2e_miou_parity.py)    ours-bf16 (the TPU config)
  torch-f32 (reference anchor)                torch-fp16 (reference GPU eval)

Reported: mIoU of each, |delta| vs the f32 anchors, and pixel flip
rates. NOTE random weights OVERSTATE drift (top-2 logit margins are
near-zero everywhere, so any rounding flips the argmax — same caveat as
tools/bench_pad_deviation.py); the numbers below are a conservative
upper bound on real-checkpoint drift.

Usage: python tools/bench_bf16_drift.py [--images 8] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")
sys.path.insert(1, "tests")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=3)
    args = ap.parse_args()

    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dat_segmentation_tpu.eval import SegInferencer, evaluate_dataset

    from test_e2e_miou_parity import (  # tests harness (mini geometry)
        IMG_SCALE,
        N_CLASSES,
        FakeValSet,
        _model_pair,
        _torch_predict,
        ref_models,
    )

    if ref_models is None:
        print("reference repo not mounted; torch legs skipped",
              file=sys.stderr)

    shapes = [(37, 53), (64, 64), (48, 80), (91, 61),
              (60, 60), (33, 47), (72, 56), (45, 45)][: args.images]
    while len(shapes) < args.images:
        shapes.append(shapes[len(shapes) % 8])
    ds = FakeValSet(shapes, seed=args.seed)

    tmodel, ours, variables, _ = _model_pair()

    def _ours(compute_dtype):
        preds = {}
        inf = SegInferencer(
            ours, variables, num_classes=N_CLASSES, mode="whole",
            bucket=32, exact=True,
            compute_dtype=compute_dtype, transfer_dtype=compute_dtype,
        )
        res = evaluate_dataset(
            inf, ds, num_classes=N_CLASSES, img_scale=IMG_SCALE,
            batch_size=args.batch, verbose=False,
            on_pred=lambda i, p: preds.__setitem__(i, p.copy()),
        )
        return res["mIoU"], preds

    miou_f32, preds_f32 = _ours(jnp.float32)
    miou_bf16, preds_bf16 = _ours(jnp.bfloat16)

    def _flips(a, b):
        tot = mis = 0
        for i in range(len(ds)):
            d = a[i] != b[i]
            tot += d.size
            mis += int(d.sum())
        return mis / tot

    out = {
        "metric": "bf16_miou_drift",
        "images": args.images,
        "ours_f32_miou": round(miou_f32, 6),
        "ours_bf16_miou": round(miou_bf16, 6),
        "bf16_abs_delta": round(abs(miou_bf16 - miou_f32), 6),
        "bf16_pixel_flip_rate": round(_flips(preds_f32, preds_bf16), 6),
        "note": "random weights => conservative upper bound "
                "(near-zero top-2 margins)",
    }

    if ref_models is not None:
        import torch

        from dat_segmentation_tpu.train.metrics import StreamingIoU

        def _torch_eval(model):
            iou = StreamingIoU(N_CLASSES, 255)
            preds = {}
            for i in range(len(ds)):
                raw, gt = ds.load_raw(i)
                pred, _ = _torch_predict(model, raw, gt.shape)
                preds[i] = pred
                iou.update(pred, gt)
            return iou.miou(), preds

        t32_miou, t32_preds = _torch_eval(tmodel)
        out["torch_f32_miou"] = round(t32_miou, 6)
        out["ours_bf16_vs_torch_f32_delta"] = round(
            abs(miou_bf16 - t32_miou), 6
        )
        try:
            # the reference's GPU eval dtype (mmcv wrap_fp16_model)
            import copy

            thalf = copy.deepcopy(tmodel).half()

            class _HalfWrap(torch.nn.Module):
                def __init__(self, m):
                    super().__init__()
                    self.m = m

                def forward(self, x):
                    return self.m(x.half()).float()

            t16_miou, t16_preds = _torch_eval(_HalfWrap(thalf))
            out["torch_fp16_miou"] = round(t16_miou, 6)
            out["torch_fp16_abs_delta"] = round(abs(t16_miou - t32_miou), 6)
            out["torch_fp16_pixel_flip_rate"] = round(
                _flips(t32_preds, t16_preds), 6
            )
        except Exception as e:  # noqa: BLE001 — CPU fp16 conv support varies
            out["torch_fp16_error"] = repr(e)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
