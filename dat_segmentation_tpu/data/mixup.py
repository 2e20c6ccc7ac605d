"""Mixup + CutMix batch augmentation (timm-style adapter).

Reference: datasets/imagenet.py:16-36 — Mixup(alpha=0.8) + CutMix(1.0),
switch prob 0.5, label smoothing 0.1, applied per batch. Implemented as a
pure jnp function usable inside the jitted train step (rng-keyed, static
shapes — no host round trip per batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _one_hot_smooth(labels, num_classes, smoothing):
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _rand_bbox(key, h, w, lam):
    """CutMix box with area ratio (1 - lam), clipped to the image."""
    cut = jnp.sqrt(1.0 - lam)
    ch, cw = (h * cut).astype(jnp.int32), (w * cut).astype(jnp.int32)
    ky, kx = jax.random.split(key)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    y1 = jnp.clip(cy - ch // 2, 0, h)
    y2 = jnp.clip(cy + ch // 2, 0, h)
    x1 = jnp.clip(cx - cw // 2, 0, w)
    x2 = jnp.clip(cx + cw // 2, 0, w)
    return y1, y2, x1, x2


def mixup_cutmix(
    key,
    images: jax.Array,
    labels: jax.Array,
    *,
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    switch_prob: float = 0.5,
    label_smoothing: float = 0.1,
):
    """Returns (mixed images, soft labels (B, num_classes)).

    One lambda per batch (timm default), flipped-batch pairing.
    """
    B, H, W, _ = images.shape
    k_sel, k_lam1, k_lam2, k_box = jax.random.split(key, 4)
    use_cutmix = jax.random.bernoulli(k_sel, switch_prob)

    lam_mix = jax.random.beta(k_lam1, mixup_alpha, mixup_alpha)
    lam_cut = jax.random.beta(k_lam2, cutmix_alpha, cutmix_alpha)

    flipped = images[::-1]

    # mixup branch
    lam = jnp.where(use_cutmix, lam_cut, lam_mix)
    mixed_mix = images * lam + flipped * (1.0 - lam)

    # cutmix branch: paste flipped box, correct lam by actual box area
    y1, y2, x1, x2 = _rand_bbox(k_box, H, W, lam_cut)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    box = ((yy >= y1) & (yy < y2) & (xx >= x1) & (xx < x2))[None, :, :, None]
    mixed_cut = jnp.where(box, flipped, images)
    lam_cut_eff = 1.0 - ((y2 - y1) * (x2 - x1)) / (H * W)

    images_out = jnp.where(use_cutmix, mixed_cut, mixed_mix)
    lam_eff = jnp.where(use_cutmix, lam_cut_eff, lam_mix)

    t1 = _one_hot_smooth(labels, num_classes, label_smoothing)
    t2 = _one_hot_smooth(labels[::-1], num_classes, label_smoothing)
    targets = t1 * lam_eff + t2 * (1.0 - lam_eff)
    return images_out.astype(images.dtype), targets.astype(jnp.float32)
