"""Optimizer factory: AdamW with no-weight-decay parameter labels.

Reference: AdamW with decay disabled for {absolute_pos_embed,
relative_position_bias_table, rpe_table, norm} parameter names
(new_train.py:145-159; configs/dat/upn_tiny_160k_dp03_lr6.py:43-48), plus
optional global-norm grad clipping (train_backbone.py:106-108).

The name matching mirrors torch: a param is no-decay when any key appears
in its dotted path, OR when it is 1-D (biases, LN/BN scales) — the torch
loop checks ``param.ndim <= 1 or name endswith .bias`` in common recipes;
the reference's builder matches substrings of the name. Here 'norm'
matches every LayerNorm/BatchNorm scope, exactly like the mmseg
custom_keys rule.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import optax


def no_decay_mask(params, keys: Sequence[str]) -> dict:
    """Pytree of bools: True where weight decay applies."""

    def decide(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path).lower()
        if leaf.ndim <= 1:
            return False
        return not any(k.lower() in name for k in keys)

    return jax.tree_util.tree_map_with_path(decide, params)


def make_optimizer(
    schedule: Callable,
    params,
    *,
    betas=(0.9, 0.999),
    weight_decay: float = 0.01,
    no_decay_keys: Sequence[str] = (
        "absolute_pos_embed",
        "relative_position_bias_table",
        "rpe_table",
        "norm",
    ),
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    mask = no_decay_mask(params, no_decay_keys)
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=betas[0],
            b2=betas[1],
            eps=1e-8,
            weight_decay=weight_decay,
            mask=mask,
        )
    )
    return optax.chain(*chain)
