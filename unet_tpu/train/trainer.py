"""Training engine: optax state, fused train/eval steps, schedules.

Functional re-design of the reference trainers (tools/train.py,
tools/train_3class_advanced.py): one jitted `train_step` carrying
{params, batch_stats, opt_state} instead of an epoch-of-Python-ops loop.
AMP becomes bf16 compute dtype; GradScaler is unnecessary (bf16 needs no
loss scaling); grad accumulation is optax.MultiSteps; DDP-less DP comes
from jitting the same step over a mesh (parallel.mesh).

Hyperparameter parity with the flagship run (train_3class_advanced.py):
  * AdamW lr 2e-4, weight_decay 1e-4 (:239-244)
  * OneCycle cosine, pct_start 0.1, div 10, final_div 100 (:246-255)
  * grad clip 1.0, grad accumulation 2 (:314-321)
  * AdvancedCombinedLoss focal .35 / tversky .45 (a .25, b .75) / dice .20,
    class weights [0.02, 1, 1] (:224-233)
  * deep-supervision weights [0.1, 0.2, 0.3, 0.4] over [out, out1, out2, out3]
    (:295-305 — NB the reference weights the *deepest* head most)
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from unet_tpu.models import losses as L
from unet_tpu.ops import seg_metrics


@dataclass(frozen=True)
class LossCfg:
    kind: str = "advanced"           # "advanced" | "combined" | "ce" | "dice"
    class_weights: Tuple[float, ...] = ()
    weight_focal: float = 0.35
    weight_tversky: float = 0.45
    weight_dice: float = 0.20
    focal_gamma: float = 2.0
    tversky_alpha: float = 0.25
    tversky_beta: float = 0.75
    weight_ce: float = 1.0           # combined
    ds_weights: Tuple[float, ...] = (0.1, 0.2, 0.3, 0.4)


@dataclass(frozen=True)
class OptimCfg:
    lr: float = 2e-4
    weight_decay: float = 1e-4
    schedule: str = "onecycle"       # "onecycle" | "cosine" | "cosine_restarts" | "constant"
    total_steps: int = 10_000
    pct_start: float = 0.1
    div_factor: float = 10.0
    final_div_factor: float = 100.0
    clip_norm: float = 1.0
    accum_steps: int = 1
    restart_period: int = 1000       # cosine_restarts (train_3class_ultra.py)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def build_schedule(cfg: OptimCfg) -> optax.Schedule:
    if cfg.schedule == "onecycle":
        # torch OneCycleLR(anneal='cos') equivalent
        return optax.cosine_onecycle_schedule(
            transition_steps=cfg.total_steps, peak_value=cfg.lr,
            pct_start=cfg.pct_start, div_factor=cfg.div_factor,
            final_div_factor=cfg.final_div_factor)
    if cfg.schedule == "cosine":
        return optax.cosine_decay_schedule(cfg.lr, cfg.total_steps)
    if cfg.schedule == "cosine_restarts":
        # CosineAnnealingWarmRestarts (reference tools/train_3class_ultra.py)
        return optax.join_schedules(
            [optax.cosine_decay_schedule(cfg.lr, cfg.restart_period)]
            * max(cfg.total_steps // cfg.restart_period, 1),
            boundaries=[cfg.restart_period * (i + 1)
                        for i in range(max(cfg.total_steps // cfg.restart_period, 1) - 1)])
    if cfg.schedule == "constant":
        return optax.constant_schedule(cfg.lr)
    raise ValueError(cfg.schedule)


def build_optimizer(cfg: OptimCfg) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.adamw(build_schedule(cfg), weight_decay=cfg.weight_decay),
    )
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


def make_loss_fn(cfg: LossCfg):
    cw = jnp.asarray(cfg.class_weights) if cfg.class_weights else None
    if cfg.kind == "advanced":
        base = partial(L.advanced_combined_loss, weight_focal=cfg.weight_focal,
                       weight_tversky=cfg.weight_tversky, weight_dice=cfg.weight_dice,
                       focal_gamma=cfg.focal_gamma, tversky_alpha=cfg.tversky_alpha,
                       tversky_beta=cfg.tversky_beta, class_weights=cw)
    elif cfg.kind == "combined":
        base = partial(L.combined_loss, weight_ce=cfg.weight_ce,
                       weight_dice=cfg.weight_dice, class_weights=cw)
    elif cfg.kind == "ce":
        base = lambda lg, lb: (L.cross_entropy_loss(lg, lb, cw),)
    elif cfg.kind == "dice":
        base = lambda lg, lb: (L.dice_loss(lg, lb, class_weights=cw),)
    else:
        raise ValueError(cfg.kind)

    def loss_fn(outputs, labels):
        if isinstance(outputs, (list, tuple)):
            ws = cfg.ds_weights[-len(outputs):]
            return L.deep_supervision_loss(outputs, labels, base, ws)
        res = base(outputs, labels)
        return res[0], res[1:]

    return loss_fn


def create_train_state(model, rng, sample_shape: Sequence[int],
                       optim: OptimCfg) -> TrainState:
    variables = model.init(rng, jnp.zeros(sample_shape, jnp.float32), train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = build_optimizer(optim)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params),
                      apply_fn=model.apply, tx=tx)


def make_train_step(loss_cfg: LossCfg, pmean_axis: Optional[str] = None,
                    track_sample_loss: bool = False):
    """Returns train_step(state, images, labels) -> (state, metrics).

    `pmean_axis` names a mesh axis for explicit gradient pmean when the step
    runs under shard_map; under plain jit-over-NamedSharding XLA inserts the
    all-reduce itself and this stays None.

    `track_sample_loss` adds metrics["sample_loss"] (B,), the per-sample CE
    of the main output — feeds SampleLossTracker (the reference's worst-K
    reporting, tools/train_with_monitoring.py:96-117).
    """
    loss_fn = make_loss_fn(loss_cfg)

    def step(state: TrainState, images: jnp.ndarray, labels: jnp.ndarray):
        def compute(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                outs, mut = state.apply_fn(variables, images, train=True,
                                           mutable=["batch_stats"])
                new_stats = mut["batch_stats"]
            else:
                outs = state.apply_fn(variables, images, train=True)
                new_stats = {}
            total, comps = loss_fn(outs, labels)
            sample_loss = None
            if track_sample_loss:
                main = outs[0] if isinstance(outs, (list, tuple)) else outs
                logp = jax.nn.log_softmax(main, axis=-1)
                nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
                sample_loss = jnp.mean(nll, axis=(-2, -1))
            return total, (comps, new_stats, sample_loss)

        (loss, (comps, new_stats, sample_loss)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            new_stats = jax.lax.pmean(new_stats, pmean_axis)
        updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        if sample_loss is not None:
            metrics["sample_loss"] = sample_loss
        if comps:
            for name, v in zip(("focal", "tversky", "dice", "extra"), comps):
                metrics[name] = v
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats, opt_state=opt_state)
        return new_state, metrics

    return step


def make_eval_step(num_classes: int):
    """Jittable eval: logits -> psum-able confusion matrix
    (reference validate loop, train_3class_advanced.py:35-74, with the
    per-pixel numpy loops replaced by one device scatter-add)."""

    def step(state: TrainState, images: jnp.ndarray, labels: jnp.ndarray):
        logits = state.apply_fn(state.variables, images, train=False)
        if isinstance(logits, (list, tuple)):
            logits = logits[0]
        pred = jnp.argmax(logits, axis=-1)
        return seg_metrics.confusion_matrix(pred, labels, num_classes)

    return step
