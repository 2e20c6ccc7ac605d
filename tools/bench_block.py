"""In-situ deformable-attention block benchmark (real TPU).

Chains R applications of one DeformableAttention block inside a single
jit program (out_{i+1} = block(out_i)), so per-dispatch tunnel overhead
(~1.5 ms/call, measured in tools/bench_bias.py) amortizes away and the
timing reflects the compiled kernel stream — the same context the block
runs in inside the backbone.

Usage:
  python tools/bench_block.py --stage 0 --repeats 8 [--no-pe] [--impl xla]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

# DAT-T++ per-stage attention configs at 512x512 input
# (dim, heads, groups, stride, ksize, q_size)
STAGE_CFG = {
    0: dict(dim=64, n_heads=2, n_groups=1, stride=8, ksize=9, q_size=(56, 56), hw=128),
    1: dict(dim=128, n_heads=4, n_groups=2, stride=4, ksize=7, q_size=(28, 28), hw=64),
    2: dict(dim=256, n_heads=8, n_groups=4, stride=2, ksize=5, q_size=(14, 14), hw=32),
    3: dict(dim=512, n_heads=16, n_groups=8, stride=1, ksize=3, q_size=(7, 7), hw=16),
}
B = 4


def _fetch(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--no-pe", action="store_true")
    ap.add_argument("--impl", default="xla")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=B)
    ap.add_argument("--grad", action="store_true",
                    help="time fwd+bwd (value_and_grad wrt params and x)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dat_segmentation_tpu.models.deformable_attention import (
        DeformableAttention,
    )

    c = STAGE_CFG[args.stage]
    hw = c.pop("hw")
    block = DeformableAttention(
        **c,
        offset_range_factor=-1.0,
        use_pe=not args.no_pe,
        kernel_impl=args.impl,
    )
    x = jnp.asarray(
        np.random.RandomState(0)
        .randn(args.batch, hw, hw, c["dim"])
        .astype(np.float32)
    ).astype(jnp.bfloat16)
    variables = block.init({"params": jax.random.PRNGKey(0)}, x)
    variables = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if jnp.issubdtype(v.dtype, jnp.floating)
        else v,
        variables,
    )

    R = args.repeats

    if args.grad:
        params = variables["params"]

        @jax.jit
        def chained(params, x):
            def loss(p, x):
                for _ in range(R):
                    x = block.apply({"params": p}, x) + 0.1 * x
                return jnp.sum(x.astype(jnp.float32) ** 2)

            l, g = jax.value_and_grad(loss)(params, x)
            return l, g

        out = chained(params, x)
        _fetch(out[0][None])
        t0 = time.perf_counter()
        o = None
        for _ in range(args.iters):
            o = chained(params, x)
        _fetch(o[0][None])
        per_apply = (time.perf_counter() - t0) / args.iters / R
        mode = "fwd+bwd"
    else:
        @jax.jit
        def chained(x):
            for _ in range(R):
                x = block.apply(variables, x) + 0.1 * x
            return x

        out = chained(x)
        out.block_until_ready()
        _fetch(out)
        t0 = time.perf_counter()
        o = None
        for _ in range(args.iters):
            o = chained(x)
        _fetch(o)
        per_apply = (time.perf_counter() - t0) / args.iters / R
        mode = "fwd"
    print(
        f"stage{args.stage} impl={args.impl} pe={not args.no_pe} "
        f"B={args.batch} {mode}: {per_apply*1e3:.3f} ms/block-apply "
        f"(R={R}, iters={args.iters}, backend={jax.default_backend()})",
        flush=True,
    )


if __name__ == "__main__":
    main()
