"""Benchmark: DAT-T++ SemanticFPN forward throughput at 512x512 (bf16).

Prints ONE JSON line:
  {"metric": "images_per_sec_per_chip", "value": N, "unit": "img/s",
   "vs_baseline": fraction-of-MXU-roofline}

BASELINE.json target: >= 90% of roofline images/sec/chip on v5e for
DAT-T++ FPN @ 512x512 (the reference publishes no throughput numbers, so
the roofline fraction — achieved FLOP/s over peak bf16 FLOP/s — is the
baseline axis; vs_baseline 1.0 == 100% of roofline).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


BATCH = 4
SHAPE = (512, 512)
V5E_PEAK_FLOPS = 197e12  # bf16 peak, TPU v5e (public spec)


def main():
    from dat_segmentation_tpu.configs import get_config
    from dat_segmentation_tpu.models import build_model

    cfg = get_config("fpn_tiny_80k_dp04_lr2")
    model = build_model(cfg.model)

    x = jnp.zeros((BATCH, *SHAPE, 3), jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    variables = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if jnp.issubdtype(v.dtype, jnp.floating)
        else v,
        variables,
    )

    @jax.jit
    def fwd(image):
        return model.apply(variables, image, train=False)

    lowered = fwd.lower(x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0

    # warmup
    for _ in range(3):
        jax.block_until_ready(fwd(x))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    ips = BATCH * iters / dt
    achieved_flops = flops * iters / dt if flops else 0.0
    roofline_frac = achieved_flops / V5E_PEAK_FLOPS if flops else 0.0

    print(
        json.dumps(
            {
                "metric": "images_per_sec_per_chip",
                "value": round(ips, 2),
                "unit": "img/s (DAT-T++ FPN 512x512 bf16 fwd)",
                "vs_baseline": round(roofline_frac, 4),
            }
        )
    )
    print(
        f"# flops/img={flops/BATCH/1e9:.1f}G achieved={achieved_flops/1e12:.1f}TF/s "
        f"step={dt/iters*1e3:.1f}ms device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
