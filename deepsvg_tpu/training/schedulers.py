"""Learning-rate schedules (optax).

Reference: deepsvg/schedulers/warmup.py:5-63 (GradualWarmupScheduler) composed
with StepLR (configs/deepsvg/default_icons.py:55-57). In optax terms this is a
single schedule function: linear warmup from 0 to base_lr over ``warmup_steps``,
then staircase decay by ``gamma`` every ``decay_every`` steps.
"""
from __future__ import annotations

import optax


def warmup_step_decay(
    base_lr: float,
    warmup_steps: int,
    decay_every: int,
    gamma: float = 0.9,
) -> optax.Schedule:
    """Linear warmup -> staircase exponential decay.

    Matches reference semantics: during warmup lr ramps ``base_lr * step/total``
    (warmup.py:29-33); afterwards the StepLR decay counts scheduler steps from
    the end of warmup (train.py:103-106 steps both per iteration).
    """

    def schedule(step):
        warm = base_lr * (step + 1) / max(warmup_steps, 1)
        decayed = base_lr * gamma ** ((step - warmup_steps) // max(decay_every, 1))
        return warm * (step < warmup_steps) + decayed * (step >= warmup_steps)

    return schedule


def constant(base_lr: float) -> optax.Schedule:
    return lambda step: base_lr


def linear_ramp(start_step: int, end_step: int, start_val: float, end_val: float):
    """Linear loss-weight ramp (reference utils/utils.py:4-13 ``linear``):
    clamped linear interpolation in step."""

    def f(step):
        import jax.numpy as jnp

        t = jnp.clip((step - start_step) / max(end_step - start_step, 1), 0.0, 1.0)
        return start_val + t * (end_val - start_val)

    return f
