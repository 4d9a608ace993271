"""Training runtime: config hooks, jitted train/eval steps, schedulers,
stats, checkpointing, CLI (python -m deepsvg_tpu.training.train)."""
from .checkpoint import latest_ckpt, load_ckpt, load_model, save_ckpt, save_model
from .config import TrainConfig, load_config
from .schedulers import linear_ramp, warmup_step_decay
from .stats import SmoothedValue, Stats, Timer, TrainVars
from .trainer import (
    TrainState,
    create_train_state,
    eval_step,
    jit_eval_step,
    jit_train_step,
    make_optimizer,
    train_step,
)

__all__ = [
    "latest_ckpt", "load_ckpt", "load_model", "save_ckpt", "save_model",
    "TrainConfig", "load_config", "linear_ramp", "warmup_step_decay",
    "SmoothedValue", "Stats", "Timer", "TrainVars", "TrainState",
    "create_train_state", "eval_step", "jit_eval_step", "jit_train_step",
    "make_optimizer", "train_step",
]
