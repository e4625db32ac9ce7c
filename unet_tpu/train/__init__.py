"""Training stack: optax-based trainer with reference-parity hyperparameters."""
from unet_tpu.train.trainer import (  # noqa: F401
    LossCfg, OptimCfg, TrainState, create_train_state, make_train_step,
    make_eval_step, build_optimizer, build_schedule)
from unet_tpu.train.loop import TrainRunCfg, train_model, overfit_test  # noqa: F401
from unet_tpu.train.monitor import TrainingMonitor, SampleLossTracker, EarlyStopping  # noqa: F401
