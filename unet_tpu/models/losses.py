"""Segmentation losses (Dice / Focal / Tversky / combos) as pure JAX functions.

Numerical parity with reference src/models/losses.py:12-302, re-expressed
functionally (no Module state) so they jit/vmap/grad cleanly:

  * logits are NHWC (..., H, W, C); labels are (..., H, W) int
  * combo losses return (total, *components) like the reference, but
    components are 0-d arrays (no .item() device syncs in the train step)
  * the reference's data-dependent fallback in DiceLoss ("if no valid class,
    average all non-bg") becomes a jnp.where select — same value, still traceable
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _flatten_probs(logits: jnp.ndarray, labels: jnp.ndarray):
    """softmax probs + one-hot labels flattened to (N, P, C)."""
    c = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    p = probs.reshape((-1, probs.shape[-3] * probs.shape[-2], c))
    onehot = jax.nn.one_hot(labels.reshape((-1, labels.shape[-2] * labels.shape[-1])), c,
                            dtype=probs.dtype)
    return p, onehot


def dice_loss(logits: jnp.ndarray, labels: jnp.ndarray, smooth: float = 1e-5,
              ignore_bg: bool = True, skip_empty: bool = True,
              class_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """DiceLoss parity (reference losses.py:12-83): per-(sample, class) dice
    on softmax probs, optional bg exclusion / empty-class skipping / weights,
    with the all-empty fallback."""
    p, t = _flatten_probs(logits, labels)
    inter = jnp.sum(p * t, axis=1)                     # (N, C)
    union = jnp.sum(p, axis=1) + jnp.sum(t, axis=1)    # (N, C)
    dice = (2 * inter + smooth) / (union + smooth)

    n, c = dice.shape
    valid = jnp.ones((n, c), bool)
    nonbg = jnp.ones((n, c), bool)
    if ignore_bg and c > 0:
        valid = valid.at[:, 0].set(False)
        nonbg = nonbg.at[:, 0].set(False)
    if skip_empty:
        valid = jnp.logical_and(valid, jnp.sum(t, axis=1) > 0)
    # fallback when nothing is valid (reference losses.py:69-73)
    use_fallback = jnp.sum(valid) == 0
    sel = jnp.where(use_fallback, nonbg, valid)

    if class_weights is not None:
        w = jnp.broadcast_to(jnp.asarray(class_weights, dice.dtype)[None, :], (n, c))
        w = jnp.where(sel, w, 0.0)
        mean = jnp.sum(dice * w) / (jnp.sum(w) + 1e-6)
    else:
        mean = jnp.sum(jnp.where(sel, dice, 0.0)) / jnp.maximum(jnp.sum(sel), 1)
    return 1.0 - mean


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray, gamma: float = 2.0,
               alpha: Optional[jnp.ndarray] = None,
               ignore_index: int = -100) -> jnp.ndarray:
    """FocalLoss parity (reference losses.py:86-140)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe_labels = jnp.where(labels == ignore_index, 0, labels)
    logp_t = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    p_t = jnp.exp(logp_t)
    w = (1.0 - p_t) ** gamma
    if alpha is not None:
        w = w * jnp.asarray(alpha, logp.dtype)[safe_labels]
    loss = -w * logp_t
    mask = labels != ignore_index
    return jnp.sum(jnp.where(mask, loss, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


def tversky_loss(logits: jnp.ndarray, labels: jnp.ndarray, alpha: float = 0.3,
                 beta: float = 0.7, smooth: float = 1e-5,
                 ignore_bg: bool = True) -> jnp.ndarray:
    """TverskyLoss parity (reference losses.py:143-200). Note: unlike dice,
    empty classes are NOT skipped (matching the reference)."""
    p, t = _flatten_probs(logits, labels)
    tp = jnp.sum(p * t, axis=1)
    fp = jnp.sum(p * (1 - t), axis=1)
    fn = jnp.sum((1 - p) * t, axis=1)
    tv = (tp + smooth) / (tp + alpha * fn + beta * fp + smooth)
    if ignore_bg:
        tv = tv[:, 1:]
    return 1.0 - jnp.mean(tv)


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       class_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """torch nn.CrossEntropyLoss parity including its weighted-mean
    normalization (sum of weights of the targets, not pixel count)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if class_weights is None:
        return jnp.mean(nll)
    w = jnp.asarray(class_weights, logp.dtype)[labels]
    return jnp.sum(nll * w) / jnp.sum(w)


def combined_loss(logits, labels, weight_ce: float = 1.0, weight_dice: float = 1.0,
                  class_weights=None, dice_ignore_bg: bool = True,
                  dice_skip_empty: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """CombinedLoss parity (reference losses.py:203-241):
    returns (total, ce, dice)."""
    ce = cross_entropy_loss(logits, labels, class_weights)
    d = dice_loss(logits, labels, ignore_bg=dice_ignore_bg,
                  skip_empty=dice_skip_empty, class_weights=class_weights)
    return weight_ce * ce + weight_dice * d, ce, d


def advanced_combined_loss(logits, labels, weight_focal: float = 0.4,
                           weight_tversky: float = 0.4, weight_dice: float = 0.2,
                           focal_gamma: float = 2.0, tversky_alpha: float = 0.3,
                           tversky_beta: float = 0.7, class_weights=None,
                           dice_ignore_bg: bool = True
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """AdvancedCombinedLoss parity (reference losses.py:244-302) — the
    flagship training loss (focal .35 / tversky .45 / dice .20 in
    tools/train_3class_advanced.py:224-233). Returns (total, focal, tversky, dice)."""
    f = focal_loss(logits, labels, gamma=focal_gamma, alpha=class_weights)
    t = tversky_loss(logits, labels, alpha=tversky_alpha, beta=tversky_beta,
                     ignore_bg=dice_ignore_bg)
    d = dice_loss(logits, labels, ignore_bg=dice_ignore_bg, skip_empty=True,
                  class_weights=class_weights)
    return weight_focal * f + weight_tversky * t + weight_dice * d, f, t, d


def deep_supervision_loss(outputs, labels, loss_fn, weights=(0.1, 0.2, 0.3, 0.4)):
    """Weighted sum over [out, out1, out2, out3] deep-supervision heads
    (reference tools/train_3class_advanced.py:295-305 uses weights
    [0.1, 0.2, 0.3, 0.4] over [out3, out2, out1, out] order; pass the weight
    per output position here, main output last weight)."""
    total = 0.0
    comps = None
    for w, out in zip(weights, outputs):
        res = loss_fn(out, labels)
        main = res[0] if isinstance(res, tuple) else res
        total = total + w * main
        if comps is None and isinstance(res, tuple):
            comps = res[1:]
    return total, comps
