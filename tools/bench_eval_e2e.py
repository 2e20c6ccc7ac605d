"""End-to-end eval-pipeline throughput on real TPU (VERDICT r4 #5).

Runs the REAL eval path — keep-ratio resize to (2048,512), normalize,
bucket-pad, SegInferencer forward, softmax-resize to ori shape, argmax,
streaming IoU — over a synthetic val set with an ADE20K-val-like shape
distribution, and reports images/sec per mode. This is the measured
counterpart of the reference's single_gpu_test throughput role
(reference tools/test.py:274).

Modes: whole (bucket-batched, exact padded inference), slide
(512x512 windows, stride 341 — mmseg's slide defaults), and optionally
--tta (6 ratios x flip; compiles MANY shapes through the remote-compile
tunnel — budget accordingly).

Usage:
  python tools/bench_eval_e2e.py [--images 32] [--batch 4] [--modes whole,slide]

Prints one JSON line per mode:
  {"metric": "eval_images_per_sec", "mode": "whole", "value": N, ...}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


class SyntheticValSet:
    """ADE-val-shaped random images + labels (load_raw API).

    Shapes drawn from the real ADE20K val distribution envelope: most
    images are ~512x683 / 683x512 after keep-ratio resize; a tail is
    panoramic (short side << long side). Fixed seed => identical set
    across runs/modes.
    """

    # (H_ori, W_ori) — representative mix; keep-ratio resize to
    # (2048, 512) maps these to at most a handful of bucket shapes
    SHAPES = [
        (512, 683), (683, 512), (512, 768), (384, 512),
        (512, 512), (768, 1024), (512, 683), (683, 512),
    ]

    def __init__(self, n: int, num_classes: int = 150, seed: int = 0):
        import numpy as np

        self.n = n
        self.num_classes = num_classes
        self.rng = np.random.RandomState(seed)
        self._cache = {}

    def __len__(self):
        return self.n

    def load_raw(self, idx: int):
        import numpy as np

        if idx not in self._cache:
            h, w = self.SHAPES[idx % len(self.SHAPES)]
            rng = np.random.RandomState(1000 + idx)
            img = rng.randint(0, 256, (h, w, 3), np.uint8)
            gt = rng.randint(0, self.num_classes, (h, w)).astype(np.uint8)
            self._cache[idx] = (img, gt)
        return self._cache[idx]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--config", default="upn_tiny_160k_dp03_lr6")
    ap.add_argument("--modes", default="whole,slide")
    ap.add_argument("--tta", action="store_true",
                    help="also run MS+flip TTA (many compiles)")
    ap.add_argument("--no-exact", action="store_true")
    ap.add_argument("--device-only", action="store_true",
                    help="also time the bucket-batched forward alone "
                         "(device-side ceiling, no logits postproc)")
    args = ap.parse_args()

    import jax

    # persistent compile cache: repeat runs (and the per-bucket shapes
    # within one run) skip the 10-25-min remote compiles
    try:
        jax.config.update("jax_compilation_cache_dir", ".xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001
        print(f"# no persistent cache: {e!r}", file=sys.stderr)

    import jax.numpy as jnp

    from dat_segmentation_tpu.configs import get_config
    from dat_segmentation_tpu.eval import SegInferencer, evaluate_dataset
    from dat_segmentation_tpu.models import build_model

    cfg = get_config(args.config)
    model = build_model(cfg.model)
    x0 = jnp.zeros((1, 512, 512, 3), jnp.float32)
    init = jax.jit(lambda k, xx: model.init({"params": k}, xx, train=False))
    variables = jax.device_get(init(jax.random.PRNGKey(0), x0))
    ds = SyntheticValSet(args.images, num_classes=cfg.model.num_classes)
    for i in range(len(ds)):  # pre-decode so timing excludes image synth
        ds.load_raw(i)

    legs = []
    for mode in args.modes.split(","):
        legs.append((mode.strip(), False))
    if args.tta:
        legs.append(("whole", True))

    if args.device_only:
        # device-side ceiling: the bucket-batched exact forward alone
        # (keep-ratio resize + normalize + pad on host, no logits
        # postproc) — the number comparable to the reference's GPU-side
        # single_gpu_test rate; host resize+argmax scales with cores
        # (postproc_workers), this does not.
        import numpy as np
        from dat_segmentation_tpu.eval.evaluate import _BucketBatcher

        inf = SegInferencer(
            model, variables, num_classes=cfg.model.num_classes,
            mode="whole", exact=not args.no_exact,
        )
        inputs = []
        for i in range(len(ds)):
            raw, gt = ds.load_raw(i)
            (inp, _), = inf.tta_inputs(raw, img_scale=(2048, 512))
            inputs.append(inp)

        def run_once():
            out_count = [0]
            b = _BucketBatcher(
                inf, args.batch,
                lambda *a: out_count.__setitem__(0, out_count[0] + 1),
            )
            for j, inp in enumerate(inputs):
                b.add(inp, {"idx": j, "flip": False, "ori": inp.shape[:2]})
            b.flush_all()
            assert out_count[0] == len(inputs)

        run_once()  # compile every bucket
        t0 = time.perf_counter()
        run_once()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "eval_images_per_sec",
            "mode": "whole_device_only",
            "value": round(args.images / dt, 2),
            "unit": f"img/s ({args.config}, {args.images} synthetic val "
                    f"imgs, scale (2048,512), batch {args.batch}, "
                    f"exact={not args.no_exact}, forward only)",
        }), flush=True)

    for mode, aug in legs:
        inf = SegInferencer(
            model, variables,
            num_classes=cfg.model.num_classes,
            mode=mode,
            exact=not args.no_exact,
        )
        # warm pass: compiles every bucket shape this image mix hits
        evaluate_dataset(
            inf, ds, num_classes=cfg.model.num_classes,
            max_images=min(len(ds), 2 * args.batch), aug_test=aug,
            batch_size=args.batch, verbose=False,
        )
        t0 = time.perf_counter()
        res = evaluate_dataset(
            inf, ds, num_classes=cfg.model.num_classes, aug_test=aug,
            batch_size=args.batch, verbose=False,
        )
        dt = time.perf_counter() - t0
        name = f"{mode}{'+tta' if aug else ''}"
        print(json.dumps({
            "metric": "eval_images_per_sec",
            "mode": name,
            "value": round(args.images / dt, 2),
            "unit": f"img/s ({args.config}, {args.images} synthetic val "
                    f"imgs, scale (2048,512), batch {args.batch}, "
                    f"exact={not args.no_exact})",
            "mIoU_sanity": round(float(res["mIoU"]), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
