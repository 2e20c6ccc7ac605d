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
                         "(no logits postproc; still pays per-batch "
                         "H2D/D2H, which DOMINATES through the axon "
                         "tunnel — seconds per ~20 MB transfer)")
    ap.add_argument("--device-compute", action="store_true",
                    help="device-side compute ceiling: inputs pre-staged "
                         "on device, all bucket programs enqueued "
                         "back-to-back, one tiny sync fetch at the end. "
                         "Excludes host<->device transfers entirely — "
                         "the number comparable to the reference's "
                         "single_gpu_test rate on a real TPU-VM host "
                         "(PCIe-rate transfers overlap the forward)")
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

    if args.device_compute:
        # The padded bucket batches the whole-mode eval would run, but
        # staged on device up front and enqueued without any per-batch
        # host sync; the device executes in order, so fetching a scalar
        # of the LAST output waits for every program (CLAUDE.md
        # benchmarking rule — block_until_ready lies under the tunnel).
        from collections import defaultdict

        import numpy as np

        from dat_segmentation_tpu.eval.evaluate import _round_up

        inf = SegInferencer(
            model, variables, num_classes=cfg.model.num_classes,
            mode="whole", exact=not args.no_exact,
        )
        bufs = defaultdict(list)
        for i in range(len(ds)):
            raw, _ = ds.load_raw(i)
            (inp, _), = inf.tta_inputs(raw, img_scale=(2048, 512))
            key = (_round_up(inp.shape[0], inf.bucket),
                   _round_up(inp.shape[1], inf.bucket))
            bufs[key].append(inp)
        staged = []
        for (hb, wb), imgs in bufs.items():
            for c0 in range(0, len(imgs), args.batch):
                chunk = imgs[c0:c0 + args.batch]
                padded = np.zeros((args.batch, hb, wb, 3), np.float32)
                valid = np.full((args.batch, 2), (hb, wb), np.int32)
                for j, im in enumerate(chunk):
                    padded[j, : im.shape[0], : im.shape[1]] = im
                    valid[j] = im.shape[:2]
                exact = inf.exact and any(
                    im.shape[:2] != (hb, wb) for im in chunk
                )
                staged.append((
                    jnp.asarray(padded),
                    jnp.asarray(valid) if exact else None,
                ))

        def enqueue_all():
            out = None
            for img_d, hw_d in staged:
                out = (inf._fwd_exact(img_d, hw_d) if hw_d is not None
                       else inf._fwd(img_d))
            return out

        out = enqueue_all()  # compile + stage warm
        np.asarray(jax.device_get(out[0, 0, 0, 0]))
        t0 = time.perf_counter()
        out = enqueue_all()
        np.asarray(jax.device_get(out[0, 0, 0, 0]))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "eval_images_per_sec",
            "mode": "whole_device_compute",
            "value": round(args.images / dt, 2),
            "unit": f"img/s ({args.config}, {args.images} synthetic val "
                    f"imgs, scale (2048,512), batch {args.batch}, "
                    f"exact={not args.no_exact}, device compute only — "
                    f"no host<->device transfers in the timed loop)",
        }), flush=True)

    for mode, aug in legs:
        if not mode:
            continue
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
