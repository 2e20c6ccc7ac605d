"""Chained sub-module benchmark: where does the non-attention time go?

Times each backbone building block in-situ (R chained applications in one
jit program, like tools/bench_block.py) at DAT-T++ 512x512 stage shapes:
conv stem, 'X' block (dwconv k=7 + LN + ConvMLP), ConvMLP alone, LPU,
LayerNorm2d, downsample conv.

Usage: python tools/bench_parts.py [--stage 0] [--part all]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

STAGE = {
    0: dict(dim=64, hw=128, window=9),
    1: dict(dim=128, hw=64, window=7),
    2: dict(dim=256, hw=32, window=5),
    3: dict(dim=512, hw=16, window=3),
}
B = 4
# blocks per stage in DAT-T++ (X blocks = half of depths, MLPs = all)
DEPTHS = {0: 2, 1: 4, 2: 18, 3: 2}


def _fetch(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def bench(name, module, variables, x, repeats, iters):
    @jax.jit
    def chained(x):
        for _ in range(repeats):
            x = module.apply(variables, x) * 0.5 + x * 0.5
        return x

    out = chained(x)
    out.block_until_ready()
    _fetch(out)
    t0 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = chained(x)
    _fetch(o)
    per = (time.perf_counter() - t0) / iters / repeats
    print(f"  {name}: {per*1e3:.3f} ms/apply", flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, nargs="*", default=[0, 1, 2, 3])
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--parts", nargs="*",
        default=["xblock", "convmlp", "lpu", "ln", "gelu"],
    )
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from flax import linen as nn

    from dat_segmentation_tpu.models.layers import (
        ConvMlp,
        LayerNorm2d,
        conv2d,
        gelu,
    )

    class XBlock(nn.Module):
        dim: int
        window: int

        @nn.compact
        def __call__(self, x):
            y = LayerNorm2d(name="ln1")(x)
            y = conv2d(y, self.dim, self.window,
                       padding=self.window // 2, groups=self.dim,
                       name="dw")
            y = LayerNorm2d(name="ln2")(y)
            y = ConvMlp(self.dim, self.dim * 4, name="mlp")(y)
            return y

    class Lpu(nn.Module):
        dim: int

        @nn.compact
        def __call__(self, x):
            return x + conv2d(x, self.dim, 3, padding=1, groups=self.dim,
                              name="dw")

    class LnOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            return LayerNorm2d()(x)

    class GeluOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            return gelu(x)

    class MlpOnly(nn.Module):
        dim: int

        @nn.compact
        def __call__(self, x):
            return ConvMlp(self.dim, self.dim * 4)(x)

    totals = {}
    for s in args.stage:
        c = STAGE[s]
        print(f"stage {s} (dim={c['dim']}, {c['hw']}x{c['hw']}):", flush=True)
        x = jnp.asarray(
            np.random.RandomState(0)
            .randn(B, c["hw"], c["hw"], c["dim"])
            .astype(np.float32)
        ).astype(jnp.bfloat16)
        mods = {
            "xblock": XBlock(c["dim"], c["window"]),
            "convmlp": MlpOnly(c["dim"]),
            "lpu": Lpu(c["dim"]),
            "ln": LnOnly(),
            "gelu": GeluOnly(),
        }
        for p in args.parts:
            m = mods[p]
            variables = m.init({"params": jax.random.PRNGKey(0)}, x)
            variables = jax.tree.map(
                lambda v: v.astype(jnp.bfloat16)
                if jnp.issubdtype(v.dtype, jnp.floating)
                else v,
                variables,
            )
            per = bench(p, m, variables, x, args.repeats, args.iters)
            totals.setdefault(p, 0.0)
            totals[p] += per * DEPTHS[s]
    print("\nweighted totals over depths (2,4,18,2):")
    for p, t in totals.items():
        print(f"  {p}: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
