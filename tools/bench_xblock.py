"""Single-stage X-block kernel check/bench on real TPU.

Validates Mosaic legality and measures the fused X-block kernel vs the
XLA composite at one stage geometry without paying a full-model compile.

Usage: python tools/bench_xblock.py [--stage 0..3] [--batch 8] [--mlp]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

# (H, W, C) per DAT-T++ stage at 512^2 input
STAGES = [(128, 128, 64), (64, 64, 128), (32, 32, 256), (16, 16, 512)]


def _fetch(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--k", type=int, default=7)
    ap.add_argument("--mlp", action="store_true",
                    help="MLP-only mode (D-block fusion)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dat_segmentation_tpu.ops.pallas.x_block import (
        _composite,
        fused_conv_mlp,
        fused_x_block,
    )

    H, W, C = STAGES[args.stage]
    B, k, E = args.batch, args.k, 4
    rng = np.random.RandomState(0)

    def t(*s, scale=0.1):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * scale)

    x = t(B, H, W, C, scale=0.5).astype(jnp.bfloat16)
    p = dict(
        w3=t(3, 3, 1, C), b3=t(C), w7=t(k, k, 1, C), b7=t(C),
        g=t(C) + 1.0, be=t(C), wf1=t(C, E * C), bf1=t(E * C),
        wd=t(3, 3, 1, E * C), bd=t(E * C), wf2=t(E * C, C), bf2=t(C),
    )
    interp = jax.default_backend() != "tpu"

    if args.mlp:
        fused = jax.jit(lambda x_: fused_conv_mlp(
            x_, p["g"], p["be"], p["wf1"], p["bf1"], p["wd"], p["bd"],
            p["wf2"], p["bf2"], interp))
        comp = jax.jit(lambda x_: _composite(
            x_, None, None, jnp.ones((1, 1, 1, C)), jnp.zeros(C), p["g"],
            p["be"], p["wf1"], p["bf1"], p["wd"], p["bd"], p["wf2"],
            p["bf2"], k=1, with_lpu=False))
    else:
        fused = jax.jit(lambda x_: fused_x_block(
            x_, p["w3"], p["b3"], p["w7"], p["b7"], p["g"], p["be"],
            p["wf1"], p["bf1"], p["wd"], p["bd"], p["wf2"], p["bf2"],
            k, True, interp))
        comp = jax.jit(lambda x_: _composite(
            x_, p["w3"], p["b3"], p["w7"], p["b7"], p["g"], p["be"],
            p["wf1"], p["bf1"], p["wd"], p["bd"], p["wf2"], p["bf2"],
            k=k, with_lpu=True))

    a = fused(x)
    b = comp(x)
    d = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    print(f"stage {args.stage} ({H}x{W}x{C}) b{B} "
          f"{'mlp' if args.mlp else 'xblock'}: max|diff|={d:.2e}")

    for fn, name in ((fused, "fused"), (comp, "xla")):
        for _ in range(3):
            _fetch(fn(x))
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn(x)
        _fetch(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"  {name}: {dt*1e3:.3f} ms/block")


if __name__ == "__main__":
    main()
