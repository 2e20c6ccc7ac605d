"""Depthwise-conv fwd+bwd microbench: XLA grouped conv vs shift-FMA.

The round-3 train-step attribution (CLAUDE.md) shows the all-X
conv/LN/MLP BACKWARD is ~92% of the train step — far above the
theoretical 2-3x of forward. The forward-only comparison picked XLA's
grouped-conv emitter (24.8 vs 30.3 ms allx chain), but the backward of
``conv_general_dilated`` with feature_group_count=C computes the weight
gradient as a batch-grouped conv that TPU may lower poorly, while the
shift-FMA form's VJP is more shifted FMAs + k^2 fused reductions.

This bench times value_and_grad of sum(dwconv(x)) wrt (x, w) for both
forms at each DAT-T++ stage geometry, isolating the question.

Usage: python tools/bench_dwconv_grad.py [--batch 4] [--k 7] [--cpu]
"""

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

STAGES = [(128, 128, 64), (64, 64, 128), (32, 32, 256), (16, 16, 512)]


def _fetch(tree):
    import jax

    for leaf in jax.tree.leaves(tree):
        np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--k", type=int, default=7)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--stages", type=str, default="0,1,2,3")
    ap.add_argument(
        "--cmul",
        type=int,
        default=1,
        help="channel multiplier (4 = ConvMLP hidden-dim geometry)",
    )
    ap.add_argument(
        "--chain",
        type=int,
        default=1,
        help="apply the conv N times inside one jit (residual chain) to "
        "amortize the ~1.4ms per-dispatch tunnel overhead; reported "
        "times are per application",
    )
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from jax import lax

    k = args.k
    pad = k // 2

    def conv_form(x, w):
        return lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding=[(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1],
        )

    def shift_form(x, w):
        H, W = x.shape[1], x.shape[2]
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        out = None
        for di in range(k):
            for dj in range(k):
                term = xp[:, di : di + H, dj : dj + W, :] * w[di, dj, 0]
                out = term if out is None else out + term
        return out

    # conv fwd + shift-FMA backward via custom_vjp: same math, the VJP
    # avoids whatever the grouped-conv transpose lowers to.
    @jax.custom_vjp
    def hybrid_form(x, w):
        return conv_form(x, w)

    def hybrid_fwd(x, w):
        return conv_form(x, w), (x, w)

    def hybrid_bwd(res, g):
        x, w = res
        H, W = x.shape[1], x.shape[2]
        gp = jnp.pad(g, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        dx = None
        for di in range(k):
            for dj in range(k):
                # correlation with flipped taps
                term = gp[:, di : di + H, dj : dj + W, :] * w[
                    k - 1 - di, k - 1 - dj, 0
                ]
                dx = term if dx is None else dx + term
        dw = jnp.stack(
            [
                jnp.stack(
                    [
                        jnp.sum(
                            xp[:, di : di + H, dj : dj + W, :] * g,
                            axis=(0, 1, 2),
                        )
                        for dj in range(k)
                    ]
                )
                for di in range(k)
            ]
        )[:, :, None, :]
        return dx, dw.astype(w.dtype)

    hybrid_form.defvjp(hybrid_fwd, hybrid_bwd)

    forms = {"conv": conv_form, "shift": shift_form, "hybrid": hybrid_form}
    rng = np.random.RandomState(0)
    B = args.batch

    for si in [int(s) for s in args.stages.split(",")]:
        H, W, C = STAGES[si]
        C *= args.cmul
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5).astype(
            jnp.bfloat16
        )
        w = jnp.asarray(rng.randn(k, k, 1, C).astype(np.float32) * 0.1).astype(
            jnp.bfloat16
        )
        for name, f in forms.items():
            N = args.chain

            @partial(jax.jit, static_argnames=())
            def step(x, w, f=f):
                def loss(x, w):
                    y = x
                    for _ in range(N):
                        y = y + f(y, w)  # residual keeps magnitudes sane
                    return jnp.sum(y.astype(jnp.float32))

                l, grads = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
                return l, grads

            l, g = step(x, w)
            _fetch(g)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                l, g = step(x, w)
            _fetch(g)
            dt = (time.perf_counter() - t0) / args.iters / N * 1e3

            # fwd-only for the same form, same chain length
            @partial(jax.jit, static_argnames=())
            def fwd(x, w, f=f):
                y = x
                for _ in range(N):
                    y = y + f(y, w)
                return y

            y = fwd(x, w)
            _fetch(y)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                y = fwd(x, w)
            _fetch(y)
            dtf = (time.perf_counter() - t0) / args.iters / N * 1e3
            print(
                f"stage{si} ({H}x{W}x{C}) {name:6s}: "
                f"fwd {dtf:7.3f} ms  fwd+bwd {dt:7.3f} ms  (per appl)",
                flush=True,
            )


if __name__ == "__main__":
    main()
