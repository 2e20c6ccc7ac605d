"""Round-5 perf probes (VERDICT r4 #2 and #4), batched into one process.

Leg 1  fwd control      — DAT-T++ FPN b16 512x512 bf16 (cache-warm).
Leg 2  fwd overlap probe — the SAME total work as leg 1 issued as TWO
        independent half-batch forwards inside ONE XLA program. If the
        TPU backend can overlap the VPU-bound X-chain of one half with
        the MXU-bound D-path of the other, this beats leg 1; if the core
        serializes independent HLO chains (one instruction stream), it
        matches leg 1. Either way docs/ROOFLINE.md §3's open lever gets
        its measured number.
Leg 3  train control    — upn_tiny b16 train step (cache-warm).
Leg 4  train LN-bf16    — DAT_TPU_LN_BF16=1: LayerNorm statistics in
        dtype-native bf16 instead of the f32 upcast, attacking the
        LN/dwconv backward VPU floor (92% of the step). Expected ~nil on
        the f32-ALU VPU; measured either way (ROOFLINE.md §4).

Usage: python tools/bench_probes_r5.py [--legs 1,2,3,4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def _cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", ".xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001
        print(f"# no persistent cache: {e!r}", file=sys.stderr)


def _fetch(tree):
    import jax
    import numpy as np

    for leaf in jax.tree.leaves(tree):
        np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def _fwd_variables(batch):
    import jax
    import jax.numpy as jnp

    from dat_segmentation_tpu.configs import get_config
    from dat_segmentation_tpu.models import build_model

    cfg = get_config("fpn_tiny_80k_dp04_lr2")
    model = build_model(cfg.model)
    x = jnp.zeros((batch, 512, 512, 3), jnp.bfloat16)
    # jitted init: ONE program instead of ~1000 eager per-op dispatches
    # through the device tunnel (minutes each leg)
    init = jax.jit(lambda k, xx: model.init({"params": k}, xx, train=False))
    variables = init(jax.random.PRNGKey(0), x)
    variables = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if jnp.issubdtype(v.dtype, jnp.floating)
        else v,
        variables,
    )
    return model, variables, x


def leg_fwd_control(batch=16, iters=20):
    import jax

    model, variables, x = _fwd_variables(batch)

    @jax.jit
    def fwd(image):
        return model.apply(variables, image, train=False)

    c = fwd.lower(x).compile()
    for _ in range(3):
        _fetch(c(x))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = c(x)
    _fetch(out)
    dt = (time.perf_counter() - t0) / iters
    _emit(leg="fwd_control", batch=batch, ms=round(dt * 1e3, 2),
          img_s=round(batch / dt, 1))
    return dt


def leg_fwd_overlap(batch=16, iters=20):
    """Two independent half-batch forwards in ONE program."""
    import jax

    model, variables, x = _fwd_variables(batch // 2)

    @jax.jit
    def fwd2(xa, xb):
        return (model.apply(variables, xa, train=False),
                model.apply(variables, xb, train=False))

    c = fwd2.lower(x, x).compile()
    for _ in range(3):
        _fetch(c(x, x))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = c(x, x)
    _fetch(out)
    dt = (time.perf_counter() - t0) / iters
    _emit(leg="fwd_overlap_2x_half", batch=batch, ms=round(dt * 1e3, 2),
          img_s=round(batch / dt, 1))
    return dt


def leg_train(batch=16, tag="train_control", iters=10):
    import bench

    t0 = time.perf_counter()
    ips = bench.bench_train(batch=batch, emit=False)
    _emit(leg=tag, batch=batch, img_s=round(ips, 2),
          wall_s=round(time.perf_counter() - t0, 1))
    return ips


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default="1,2,3,4")
    args = ap.parse_args()
    legs = {int(x) for x in args.legs.split(",")}
    _cache()

    if 1 in legs:
        leg_fwd_control()
    if 2 in legs:
        leg_fwd_overlap()
    if 3 in legs:
        os.environ.pop("DAT_TPU_LN_BF16", None)
        leg_train(tag="train_control")
    if 4 in legs:
        os.environ["DAT_TPU_LN_BF16"] = "1"
        leg_train(tag="train_ln_bf16")
        os.environ.pop("DAT_TPU_LN_BF16", None)


if __name__ == "__main__":
    main()
