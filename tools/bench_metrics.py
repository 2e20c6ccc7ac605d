"""Train-step cost of the in-step IoU counters, by lowering.

The round-3 scatter purge replaced jnp.bincount (serialized scatter-add,
40 ms at (4,512,512)x150) with a compare-and-sum histogram (14.6 ms) —
still a per-step tax paid at (B,512,512)x150 every iteration. This probe
times the FULL jitted train step (model-level, per the benchmarking
rules in CLAUDE.md — no chained microbenches) under three lowerings:

  compare  (N,1)==(1,C) fused into a VPU reduce   (round-3 default)
  matmul   same compares, N-reduce on the MXU via a ones-row dot
  none     counters removed from the step (floor: what the metrics cost)

Usage: python tools/bench_metrics.py [--batch 16] [--iters 10]
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def _fetch(tree):
    for leaf in jax.tree.leaves(tree):
        np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--config", default="upn_tiny_160k_dp03_lr6")
    ap.add_argument("--impls", nargs="*",
                    default=["compare", "matmul", "none"])
    args = ap.parse_args()

    from dat_segmentation_tpu.configs import get_config
    from dat_segmentation_tpu.models import build_model
    from dat_segmentation_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_train_step,
    )
    from dat_segmentation_tpu.parallel.mesh import shard_batch
    from dat_segmentation_tpu.train import make_optimizer, warmup_poly_schedule

    cfg = get_config(args.config)
    model = build_model(cfg.model)
    mesh = make_mesh({"data": 1})
    sched = warmup_poly_schedule(6e-5, 160000, warmup_iters=1500)
    sample = jnp.zeros((args.batch, 512, 512, 3))
    state0 = create_train_state(
        model, make_optimizer(sched, None), jax.random.PRNGKey(0), sample
    )
    tx = make_optimizer(sched, state0.params)
    state0 = state0.replace(opt_state=tx.init(state0.params), tx=tx)

    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, {
        "image": jnp.asarray(
            rng.randn(args.batch, 512, 512, 3).astype(np.float32)),
        "label": jnp.asarray(
            rng.randint(0, 150, (args.batch, 512, 512)).astype(np.int32)),
    })

    # host snapshot: the step donates its input state, so each impl must
    # start from fresh device buffers (a tree.map identity shares them
    # and the 2nd impl would see deleted arrays)
    host0 = {
        "step": np.asarray(state0.step),
        "params": jax.device_get(state0.params),
        "opt_state": jax.device_get(state0.opt_state),
        "batch_stats": jax.device_get(state0.batch_stats),
    }

    results = {}
    for impl in args.impls:
        step = make_train_step(
            model, mesh, task="seg",
            num_classes=cfg.model.num_classes, iou_impl=impl,
        )
        from dat_segmentation_tpu.parallel import TrainState

        state = TrainState(
            step=jnp.asarray(host0["step"]),
            params=jax.tree.map(jnp.asarray, host0["params"]),
            opt_state=jax.tree.map(jnp.asarray, host0["opt_state"]),
            batch_stats=jax.tree.map(jnp.asarray, host0["batch_stats"]),
            tx=tx,
        )
        # key created ONCE outside the loop: a per-iter PRNGKey is a
        # per-iter host->device transfer, and through the axon tunnel
        # each one costs seconds — it measured 23.5 s/step for a 0.33 s
        # step (2026-08-19) before this was hoisted
        key = jax.random.PRNGKey(1)
        state, m = step(state, batch, key)
        _fetch(m)
        t0 = time.time()
        for _ in range(args.iters):
            state, m = step(state, batch, key)
        _fetch(m["loss"])
        dt = (time.time() - t0) / args.iters
        results[impl] = dt
        print(f"  iou_impl={impl:8s}: {dt*1e3:7.1f} ms/step "
              f"({args.batch/dt:6.1f} img/s)", flush=True)
        del state, step

    if "none" in results:
        for impl, dt in results.items():
            if impl != "none":
                print(f"  {impl} metrics cost: "
                      f"{(dt - results['none'])*1e3:.1f} ms/step")


if __name__ == "__main__":
    main()
