"""Optimizer factory: AdamW with no-weight-decay parameter labels.

Reference: AdamW with decay disabled for {absolute_pos_embed,
relative_position_bias_table, rpe_table, norm} parameter names
(new_train.py:146-160; train_backbone.py:224-245; mmseg custom_keys at
configs/dat/upn_tiny_160k_dp03_lr6.py:43-48), plus optional global-norm
grad clipping (train_backbone.py:106-108).

The matching is reference-EXACT name-substring matching: a param is
no-decay iff any key is a substring of its dotted path — nothing else.
Faithfully kept consequences (verified against all three reference
recipes, which agree):

* projection/conv BIASES **do** get weight decay (torch names like
  ``proj_q.bias`` contain no key);
* the heads' BatchNorm params **do** get weight decay (the reference
  UPerHead's BNs are anonymous ``nn.Sequential`` entries —
  ``psp.0.1.weight`` — and mmseg's ConvModule norm is named ``bn``);
* every LayerNorm is exempt: torch wraps them in LayerNormProxy whose
  inner module is ``.norm.`` (dat_blocks.py LayerNormProxy), so the
  'norm' key catches them all. This repo spells some LN scopes with
  'ln' (stem_ln, offset_ln, down_ln, ln_cnvnxt), covered by the extra
  default keys in :func:`make_optimizer` so the effective no-decay SET
  equals the reference's.

The 10-step train-trajectory test (tests/test_train_trajectory.py)
asserts this grouping end to end against torch AdamW on the real model.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import optax


def no_decay_mask(params, keys: Sequence[str]) -> dict:
    """Pytree of bools: True where weight decay applies."""

    def decide(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path).lower()
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
        # this repo's LayerNorm scope spellings without 'norm' in them —
        # their torch counterparts all contain '.norm.' via LayerNormProxy
        # (stem_ln<->patch_proj.*.norm, offset_ln<->conv_offset.1.norm,
        # down_ln<->down_projs.*.norm, ln_cnvnxt<->ln_cnvnxt.*.norm)
        "stem_ln",
        "offset_ln",
        "down_ln",
        "ln_cnvnxt",
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
