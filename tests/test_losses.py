"""Loss parity vs torch-computed goldens of the reference semantics
(reference src/models/losses.py:12-302)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax.numpy as jnp

from unet_tpu.models import losses


@pytest.fixture
def data(rng):
    logits = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    labels = (rng.random((2, 16, 16)) * 4).astype(np.int64)
    return logits, labels


def _torch_dice(logits_nchw, target, smooth=1e-5, ignore_bg=True, skip_empty=True,
                class_weights=None):
    p = F.softmax(logits_nchw, dim=1)
    n, c = p.shape[:2]
    onehot = torch.zeros_like(p).scatter_(1, target.unsqueeze(1), 1)
    pf, tf = p.reshape(n, c, -1), onehot.reshape(n, c, -1)
    inter = (pf * tf).sum(2)
    union = pf.sum(2) + tf.sum(2)
    dice = (2 * inter + smooth) / (union + smooth)
    valid = torch.ones((n, c), dtype=torch.bool)
    if ignore_bg:
        valid[:, 0] = False
    if skip_empty:
        valid &= tf.sum(2) > 0
    if valid.sum() == 0:
        valid = torch.ones((n, c), dtype=torch.bool)
        if ignore_bg:
            valid[:, 0] = False
    if class_weights is not None:
        w = class_weights.view(1, c).expand(n, c)
        w = torch.where(valid, w, torch.zeros_like(w))
        mean = (dice * w).sum() / (w.sum() + 1e-6)
    else:
        mean = dice[valid].mean()
    return 1.0 - mean


def test_dice(data):
    logits, labels = data
    tl = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(labels)
    want = float(_torch_dice(tl, tt))
    got = float(losses.dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - want) < 1e-5


def test_dice_weighted(data):
    logits, labels = data
    w = np.array([0.02, 1.0, 1.0, 1.0], np.float32)
    want = float(_torch_dice(torch.from_numpy(logits.transpose(0, 3, 1, 2)),
                             torch.from_numpy(labels), class_weights=torch.from_numpy(w)))
    got = float(losses.dice_loss(jnp.asarray(logits), jnp.asarray(labels),
                                 class_weights=jnp.asarray(w)))
    assert abs(got - want) < 1e-5


def test_dice_empty_class_fallback():
    # all pixels bg -> skip_empty removes everything -> fallback path
    logits = np.random.default_rng(0).normal(size=(1, 8, 8, 3)).astype(np.float32)
    labels = np.zeros((1, 8, 8), np.int64)
    want = float(_torch_dice(torch.from_numpy(logits.transpose(0, 3, 1, 2)),
                             torch.from_numpy(labels)))
    got = float(losses.dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - want) < 1e-5


def test_focal(data):
    logits, labels = data
    tl = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(labels)
    logp = F.log_softmax(tl, dim=1)
    p = logp.exp()
    oh = F.one_hot(tt, 4).permute(0, 3, 1, 2).float()
    pt = (p * oh).sum(1)
    lpt = (logp * oh).sum(1)
    want = float((-((1 - pt) ** 2.0) * lpt).mean())
    got = float(losses.focal_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - want) < 2e-5


def test_focal_alpha(data):
    logits, labels = data
    alpha = np.array([0.1, 0.3, 0.3, 0.3], np.float32)
    tl = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(labels)
    logp = F.log_softmax(tl, dim=1)
    p = logp.exp()
    oh = F.one_hot(tt, 4).permute(0, 3, 1, 2).float()
    pt = (p * oh).sum(1)
    lpt = (logp * oh).sum(1)
    w = (1 - pt) ** 2.0 * torch.from_numpy(alpha)[tt]
    want = float((-w * lpt).mean())
    got = float(losses.focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                                  alpha=jnp.asarray(alpha)))
    assert abs(got - want) < 2e-5


def test_tversky(data):
    logits, labels = data
    tl = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(labels)
    p = F.softmax(tl, dim=1)
    n, c = p.shape[:2]
    oh = torch.zeros_like(p).scatter_(1, tt.unsqueeze(1), 1)
    pf, tf = p.reshape(n, c, -1), oh.reshape(n, c, -1)
    tp = (pf * tf).sum(2)
    fp = (pf * (1 - tf)).sum(2)
    fn = ((1 - pf) * tf).sum(2)
    tv = (tp + 1e-5) / (tp + 0.3 * fn + 0.7 * fp + 1e-5)
    want = float(1.0 - tv[:, 1:].mean())
    got = float(losses.tversky_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - want) < 2e-5


def test_cross_entropy_weighted(data):
    logits, labels = data
    w = np.array([0.02, 1.0, 1.0, 2.0], np.float32)
    want = float(F.cross_entropy(torch.from_numpy(logits.transpose(0, 3, 1, 2)),
                                 torch.from_numpy(labels), weight=torch.from_numpy(w)))
    got = float(losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels),
                                          jnp.asarray(w)))
    assert abs(got - want) < 2e-5


def test_advanced_combined_components(data):
    logits, labels = data
    total, f, t, d = losses.advanced_combined_loss(
        jnp.asarray(logits), jnp.asarray(labels),
        weight_focal=0.35, weight_tversky=0.45, weight_dice=0.20,
        tversky_alpha=0.25, tversky_beta=0.75)
    assert abs(float(total) - (0.35 * float(f) + 0.45 * float(t) + 0.2 * float(d))) < 1e-6


def test_deep_supervision_loss(data):
    logits, labels = data
    outs = [jnp.asarray(logits), jnp.asarray(logits * 0.5),
            jnp.asarray(logits * 0.2), jnp.asarray(logits * 0.1)]
    total, comps = losses.deep_supervision_loss(
        outs, jnp.asarray(labels),
        lambda lg, lb: losses.advanced_combined_loss(lg, lb),
        weights=(0.4, 0.3, 0.2, 0.1))
    parts = [losses.advanced_combined_loss(o, jnp.asarray(labels))[0] for o in outs]
    want = sum(w * float(p) for w, p in zip((0.4, 0.3, 0.2, 0.1), parts))
    assert abs(float(total) - want) < 1e-6
    assert comps is not None and len(comps) == 3
