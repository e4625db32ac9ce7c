"""The epoch loop: sharded steps, eval, checkpointing, early stop.

Functional equivalent of the reference's per-script epoch loops
(tools/train.py:100-463, tools/train_3class_advanced.py:276-423) driving the
jitted train/eval steps from trainer.py over the mesh (single device = 1x1).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import numpy as np

from unet_tpu import parallel
from unet_tpu.core.checkpoint import restore_checkpoint, save_checkpoint
from unet_tpu.ops.seg_metrics import metrics_from_confusion, print_metrics
from unet_tpu.train.monitor import (EarlyStopping, SampleLossTracker,
                                    TrainingMonitor)
from unet_tpu.train.trainer import (LossCfg, OptimCfg, create_train_state,
                                    make_eval_step, make_train_step)


@dataclass
class TrainRunCfg:
    epochs: int = 150
    num_classes: int = 3
    image_size: int = 512
    early_stop_patience: int = 30
    target_miou: Optional[float] = 0.83     # stop when reached (:406-408)
    ckpt_dir: str = "checkpoints"
    save_every_epochs: int = 25             # periodic ckpts (:391-398)
    seed: int = 42
    n_spatial: int = 1
    track_worst_samples: int = 0            # top-K worst-loss samples per epoch
                                            # (train_with_monitoring.py:96-117)
    loss: LossCfg = field(default_factory=LossCfg)
    optim: OptimCfg = field(default_factory=OptimCfg)


def train_model(model, train_loader, val_loader, cfg: TrainRunCfg,
                resume: Optional[str] = None) -> Dict[str, Any]:
    """Run the full training; returns {best_miou, epochs_run, state}."""
    devices = jax.devices()
    n_spatial = cfg.n_spatial if len(devices) % max(cfg.n_spatial, 1) == 0 else 1
    # the data axis must divide the batch size; use the largest such divisor
    batch_size = getattr(train_loader, "batch_size", None)
    n_data = len(devices) // n_spatial
    if batch_size:
        while n_data > 1 and batch_size % n_data != 0:
            n_data -= 1
    mesh = parallel.make_mesh(n_data=n_data, n_spatial=n_spatial,
                              devices=devices[: n_data * n_spatial])
    spatial = n_spatial > 1

    optim = cfg.optim
    if optim.total_steps <= 0:
        optim = OptimCfg(**{**optim.__dict__,
                            "total_steps": max(len(train_loader) * cfg.epochs, 1)})
    state = create_train_state(
        model, jax.random.PRNGKey(cfg.seed),
        (1, cfg.image_size, cfg.image_size, 3), optim)
    start_epoch = 0
    best_miou = 0.0
    if resume:
        state, meta = restore_checkpoint(resume, state, name="last")
        start_epoch = int(meta.get("epoch", 0)) + 1
        best_miou = float(meta.get("best_miou", 0.0))
        print(f"resumed from {resume} at epoch {start_epoch} (best {best_miou:.4f})")

    track = cfg.track_worst_samples > 0
    train_step = parallel.shard_train_step(
        make_train_step(cfg.loss, track_sample_loss=track), mesh, spatial)
    eval_step = parallel.shard_eval_step(make_eval_step(cfg.num_classes), mesh, spatial)
    monitor = TrainingMonitor(cfg.ckpt_dir)
    stopper = EarlyStopping(cfg.early_stop_patience)
    tracker = SampleLossTracker(cfg.track_worst_samples) if track else None
    sample_names = getattr(getattr(train_loader, "dataset", None),
                           "image_files", None)

    epochs_run = 0
    # defined even when the loop body never runs (resume past cfg.epochs)
    miou, precision, recall, ious = best_miou, {}, {}, {}
    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        losses, gnorms = [], []
        if tracker:
            tracker.reset()
        for batch in train_loader:
            idx = None
            if len(batch) == 3:
                idx, images, labels = batch
            else:
                images, labels = batch
            im, lb = parallel.put_batch(mesh, images, labels, spatial)
            state, metrics = train_step(state, im, lb)
            losses.append(metrics["loss"])
            gnorms.append(metrics["grad_norm"])
            if tracker is not None and "sample_loss" in metrics and idx is not None:
                for i, l in zip(idx, np.asarray(metrics["sample_loss"])):
                    name = (sample_names[int(i)] if sample_names is not None
                            else f"sample_{int(i)}")
                    tracker.record(float(l), name)
        train_loss = float(np.mean([float(np.asarray(l)) for l in losses])) if losses else 0.0
        gnorm = float(np.asarray(gnorms[-1])) if gnorms else 0.0

        cm = np.zeros((cfg.num_classes, cfg.num_classes), np.int64)
        val_batch = getattr(val_loader, "batch_size", None)
        for images, labels in val_loader:
            # pad ragged final batches to the full batch so (a) the data-axis
            # sharding stays divisible and (b) eval compiles once; padded
            # pixels get label == num_classes, which the confusion-matrix
            # scatter drops (JAX out-of-bounds scatter semantics)
            if val_batch and len(images) < val_batch:
                pad = val_batch - len(images)
                images = np.concatenate(
                    [images, np.repeat(images[-1:], pad, axis=0)], axis=0)
                labels = np.concatenate(
                    [labels, np.full((pad,) + labels.shape[1:], cfg.num_classes,
                                     labels.dtype)], axis=0)
            im, lb = parallel.put_batch(mesh, images, labels, spatial)
            cm += np.asarray(eval_step(state, im, lb), np.int64)
        miou, precision, recall, ious = metrics_from_confusion(cm)

        monitor.log_epoch(epoch, train_loss, miou, 0.0, gnorm)
        if tracker is not None and tracker.samples:
            import json as _json
            from pathlib import Path as _Path
            (_Path(cfg.ckpt_dir) / "worst_samples.json").write_text(
                _json.dumps({"epoch": epoch, "worst": tracker.worst()}, indent=2))
        dt = time.time() - t0
        print(f"epoch {epoch + 1}/{cfg.epochs}: loss {train_loss:.4f} "
              f"mIoU {miou:.4f} ({dt:.1f}s)")
        epochs_run += 1

        if miou > best_miou:
            best_miou = miou
            save_checkpoint(cfg.ckpt_dir, state, epoch=epoch, best_miou=best_miou,
                            name="best")
            print(f"  new best mIoU {best_miou:.4f} -> saved")
        if (epoch + 1) % cfg.save_every_epochs == 0:
            save_checkpoint(cfg.ckpt_dir, state, epoch=epoch, best_miou=best_miou,
                            name=f"epoch_{epoch + 1}")
        save_checkpoint(cfg.ckpt_dir, state, epoch=epoch, best_miou=best_miou,
                        name="last")

        if cfg.target_miou is not None and miou >= cfg.target_miou:
            print(f"target mIoU {cfg.target_miou} reached; stopping")
            break
        if stopper.step(miou):
            print(f"early stopping after {stopper.patience} stale epochs")
            break

    print_metrics(miou, precision, recall, ious)
    return {"best_miou": best_miou, "epochs_run": epochs_run, "state": state,
            "final_miou": miou}


def overfit_test(model, dataset, n_samples: int = 10, steps: int = 200,
                 num_classes: int = 3, image_size: int = 64,
                 lr: float = 1e-3) -> float:
    """10-sample overfit sanity gate (reference tools/overfit_test.py:1-9):
    train mIoU should exceed ~0.98 — separates data/label bugs from model
    bugs. Returns the final train mIoU."""
    idx = list(range(min(n_samples, len(dataset))))
    images = np.stack([dataset[i][0] for i in idx])
    labels = np.stack([dataset[i][1] for i in idx])

    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, image_size, image_size, 3),
        OptimCfg(lr=lr, schedule="constant", total_steps=steps, clip_norm=10.0))
    step = jax.jit(make_train_step(LossCfg(kind="ce")))
    ev = jax.jit(make_eval_step(num_classes))
    for _ in range(steps):
        state, metrics = step(state, images, labels)
    cm = np.asarray(ev(state, images, labels), np.int64)
    miou, _, _, _ = metrics_from_confusion(cm)
    return float(miou)
