"""Attribute the +0.25 training-parity mIoU delta (VERDICT r4 weak #3).

docs/PARITY.md §2 records torch 0.6380/0.6194 vs flax 0.8871 on the hard
scenes "at identical hyperparameters" and calls it faster convergence. A
25-point gap between two systems claimed equivalent needs a NAMED cause.
The candidate ingredients, checked statically first:

  * BN: flax ConvBlock uses momentum 0.9 == torch 0.1, eps 1e-5 — identical.
  * OneCycle accounting: both schedules are configured for
    len(loader)*epochs steps and advanced once per OPTIMIZER step (torch
    sched.step() after each accum'd step; optax's inner adamw count under
    MultiSteps increments identically) — both traverse the same half-curve.
  * Grad accumulation/clip: torch clips the mean-of-2 grad then steps;
    optax.MultiSteps averages 2 grads then chain(clip, adamw) — identical.
  * Losses: parity-tested against torch goldens elsewhere.
  * Weight init: torch Conv2d = kaiming_uniform(a=sqrt5) kernels
    (U(+-1/sqrt(fan_in))) + U(+-1/sqrt(fan_in)) bias; flax nn.Conv =
    lecun_normal (truncated normal, std 1/sqrt(fan_in)) + ZERO bias.
    <-- the one ingredient that differs.

This measures it both directions on the exact test_training_parity setup
(identical data, batch order, hyperparameters, 60 epochs, hard scenes):

  torch0          reference trainer, torch default init   (recorded 0.6380)
  flax            flax recipe, flax default init          (recorded 0.8871)
  flax_torchinit  flax recipe started from the torch seed-0 model's EXACT
                  initial weights (state_dict -> models/convert) — single
                  variable changed; if this lands near torch0, init is the
                  cause from the flax side
  torch_flaxinit  reference trainer with flax-style init (lecun truncated
                  normal kernels, zero biases) — confirmation from the
                  torch side

Run: python docs/experiments/attribute_training_gap.py [--arm NAME ...]
Recorded: docs/PARITY.md §2.
"""
import argparse
import math
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", os.path.join(
    tempfile.gettempdir(), f"unet_tpu_jax_cache_{os.getuid()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import torch  # noqa: E402

import test_reference_parity  # noqa: F401,E402  (sys.path + torchvision stub)
import test_training_parity as tp  # noqa: E402  (the gating test's exact setup)

EPOCHS = int(os.environ.get("UNET_TPU_PARITY_EPOCHS", 60))


def train_flax_from_torch_init(train, val, epochs: int, ckpt: str) -> float:
    """The flax recipe, but create_train_state starts from the torch seed-0
    model's exact initial weights (converted) instead of flax init."""
    from src.models.unetpp import NestedUNet as RefNestedUNet

    from unet_tpu.models.convert import convert_state_dict
    from unet_tpu.train import loop as train_loop
    from unet_tpu.train.trainer import TrainState, build_optimizer
    import jax.numpy as jnp

    torch.manual_seed(0)
    ref = RefNestedUNet(num_classes=tp.NUM_CLASSES, deep_supervision=True)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_state_dict(sd, kind="nested_unet")

    def create_from_torch(model, rng, sample_shape, optim):
        params = jax.tree_util.tree_map(jnp.asarray, variables["params"])
        stats = jax.tree_util.tree_map(
            jnp.asarray, variables.get("batch_stats", {}))
        tx = build_optimizer(optim)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=stats, opt_state=tx.init(params),
                          apply_fn=model.apply, tx=tx)

    orig = train_loop.create_train_state
    train_loop.create_train_state = create_from_torch
    try:
        return tp.train_jax(train, val, epochs, ckpt)
    finally:
        train_loop.create_train_state = orig


def train_torch_flax_init(train, val, epochs: int) -> float:
    """The reference trainer, but every Conv2d initialized flax-style.
    Subclass-patching the model class breaks on the reference's explicit
    `super(NestedUNet, self)` (module-global lookup), so patch
    Conv2d.reset_parameters instead — it is called once per conv during
    construction, before train_torch's own manual_seed matters for init."""
    from scipy.stats import truncnorm

    rng = np.random.default_rng(0)
    orig_reset = torch.nn.Conv2d.reset_parameters

    def flax_reset(self):
        fan_in = self.in_channels * self.kernel_size[0] * self.kernel_size[1]
        std = math.sqrt(1.0 / fan_in) / 0.87962566103423978
        w = truncnorm.rvs(-2, 2, size=tuple(self.weight.shape),
                          random_state=rng) * std
        with torch.no_grad():
            self.weight.copy_(torch.from_numpy(w.astype(np.float32)))
            if self.bias is not None:
                self.bias.zero_()

    torch.nn.Conv2d.reset_parameters = flax_reset
    try:
        return tp.train_torch(train, val, epochs)
    finally:
        torch.nn.Conv2d.reset_parameters = orig_reset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", action="append", choices=[
        "torch0", "flax", "flax_torchinit", "torch_flaxinit"],
        help="arms to run (default: all four)")
    args, _ = ap.parse_known_args()
    arms = args.arm or ["torch0", "flax", "flax_torchinit", "torch_flaxinit"]

    train, val = tp.make_dataset(tp.N_TRAIN, tp.N_VAL, tp.SIZE)
    print(f"# {tp.SIZE}x{tp.SIZE}, {tp.N_TRAIN} train / {tp.N_VAL} val, "
          f"{EPOCHS} epochs, hard scenes (test_training_parity setup)")
    results = {}
    for arm in arms:
        t0 = time.time()
        if arm == "torch0":
            m = tp.train_torch(train, val, EPOCHS)
        elif arm == "flax":
            with tempfile.TemporaryDirectory() as d:
                m = tp.train_jax(train, val, EPOCHS, d)
        elif arm == "flax_torchinit":
            with tempfile.TemporaryDirectory() as d:
                m = train_flax_from_torch_init(train, val, EPOCHS, d)
        else:
            m = train_torch_flax_init(train, val, EPOCHS)
        results[arm] = m
        print(f"{arm:16s} best-val mIoU {m:.4f}  ({time.time() - t0:.0f}s)",
              flush=True)

    if {"torch0", "flax", "flax_torchinit"} <= results.keys():
        gap = results["flax"] - results["torch0"]
        closed = results["flax"] - results["flax_torchinit"]
        print(f"\n# gap(flax - torch) = {gap:+.4f}; switching ONLY the init "
              f"moves flax by {-closed:+.4f} "
              f"({closed / gap:.0%} of the gap explained by init)"
              if abs(gap) > 1e-9 else "")


if __name__ == "__main__":
    main()
