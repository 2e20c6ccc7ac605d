"""LR schedules as optax-compatible callables.

* warmup-poly: linear warmup from lr*warmup_ratio over warmup_iters, then
  polynomial decay to min_lr (reference WarmupPolyLRScheduler,
  new_train.py:20-50; mmseg lr_config at upn_tiny_160k_dp03_lr6.py:50-54).
* warmup-cosine: linear warmup then cosine to min_lr
  (reference train_backbone.py:250-264, per-iteration stepping).
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_poly_schedule(
    base_lr: float,
    max_iters: int,
    *,
    warmup_iters: int = 1500,
    warmup_ratio: float = 1e-6,
    power: float = 1.0,
    min_lr: float = 0.0,
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_frac = jnp.clip(step / jnp.maximum(warmup_iters, 1), 0.0, 1.0)
        warm_lr = base_lr * (warmup_ratio + (1.0 - warmup_ratio) * warm_frac)
        decay_frac = jnp.clip(
            (step - warmup_iters) / jnp.maximum(max_iters - warmup_iters, 1),
            0.0,
            1.0,
        )
        poly_lr = (base_lr - min_lr) * (1.0 - decay_frac) ** power + min_lr
        return jnp.where(step < warmup_iters, warm_lr, poly_lr)

    return schedule


def warmup_cosine_schedule(
    base_lr: float,
    max_iters: int,
    *,
    warmup_iters: int = 0,
    warmup_ratio: float = 1e-3,
    min_lr: float = 0.0,
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_frac = jnp.clip(step / jnp.maximum(warmup_iters, 1), 0.0, 1.0)
        warm_lr = base_lr * (warmup_ratio + (1.0 - warmup_ratio) * warm_frac)
        decay_frac = jnp.clip(
            (step - warmup_iters) / jnp.maximum(max_iters - warmup_iters, 1),
            0.0,
            1.0,
        )
        cos_lr = min_lr + 0.5 * (base_lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * decay_frac)
        )
        return jnp.where(step < warmup_iters, warm_lr, cos_lr)

    return schedule
