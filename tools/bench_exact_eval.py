"""Measure the TPU cost of exact padded inference (ops/valid_extent.py).

Times the whole-mode eval forward (SegInferencer.forward_batch) on a
bucket-padded val-shaped batch, exact vs plain, on the real device.
Exact mode is the eval default (zero deviation from mmseg whole-mode
semantics); this quantifies what that correctness costs per image so
the trade stays documented.

Usage:  python tools/bench_exact_eval.py [--batch 4] [--iters 20]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--config", default="upn_tiny_160k_dp03_lr6")
    # typical ADE val resize: short side 512, long side <= 2048;
    # (512, 683) is the 4:3 landscape mode -> bucket-32 pad (512, 704)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=683)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dat_segmentation_tpu.configs import get_config
    from dat_segmentation_tpu.eval.inference import SegInferencer, _round_up
    from dat_segmentation_tpu.models import build_model

    cfg = get_config(args.config)
    model = build_model(cfg.model)
    h, w = args.height, args.width
    hb, wb = _round_up(h, 32), _round_up(w, 32)
    print(f"# shape ({h}, {w}) padded ({hb}, {wb}) batch {args.batch}")

    x0 = jnp.zeros((1, hb, wb, 3), jnp.float32)
    variables = jax.device_get(
        model.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    )
    inf = SegInferencer(model, variables, num_classes=cfg.model.num_classes)

    rng = np.random.RandomState(0)
    padded = np.zeros((args.batch, hb, wb, 3), np.float32)
    padded[:, :h, :w] = rng.randn(args.batch, h, w, 3).astype(np.float32)
    valid = np.tile(np.array([[h, w]], np.int32), (args.batch, 1))

    results = {}
    for name, kw in (("plain", {}), ("exact", {"valid_hw": valid})):
        inf.forward_batch(padded, **kw)  # compile + warm
        inf.forward_batch(padded, **kw)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = inf.forward_batch(padded, **kw)  # device_get inside
        dt = (time.perf_counter() - t0) / args.iters
        results[name] = dt
        print(
            f"{name}: {dt * 1e3:.1f} ms/batch = "
            f"{args.batch / dt:.1f} img/s  (out {out.shape})"
        )
    print(
        f"# exact overhead: {results['exact'] / results['plain']:.3f}x "
        f"({(results['exact'] - results['plain']) * 1e3:.1f} ms/batch)"
    )


if __name__ == "__main__":
    main()
