"""Learning-rate schedules (optax).

Reference: deepsvg/schedulers/warmup.py:5-63 (GradualWarmupScheduler) composed
with StepLR (configs/deepsvg/default_icons.py:55-57). In optax terms this is a
single schedule function: linear warmup from 0 to base_lr over ``warmup_steps``,
then staircase decay by ``gamma`` every ``decay_every`` steps.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_step_decay(
    base_lr: float,
    warmup_steps: int,
    decay_every: int,
    gamma: float = 0.9,
) -> optax.Schedule:
    """Linear warmup -> staircase exponential decay, bit-matching the
    reference's EFFECTIVE schedule (verified against a torch recording in
    tests/test_torch_parity_grad.py::TestLRScheduleParity).

    Two reference quirks are reproduced deliberately:

    - warmup lr at step s is ``base_lr * s / warmup_steps`` — the FIRST
      optimizer step runs at lr = 0 (GradualWarmupScheduler's __init__ calls
      an initial step(), warmup.py:23, so iteration 0 sees last_epoch=0).
    - after warmup, StepLR's internal epoch advances TWICE per training
      iteration — the train loop steps ``scheduler_lr`` directly AND
      ``scheduler_warmup`` delegates to it (train.py:103-106 +
      warmup.py:55-61) — so decay boundaries arrive at ``decay_every / 2``
      intervals: exponent = floor((warmup + 2*(s - warmup)) / decay_every).
    """

    def schedule(step):
        warm = base_lr * step / max(warmup_steps, 1)
        # StepLR's epoch counter after iteration s-1 is 2*(s-1) - warm + 1
        # (it advanced twice per post-warmup iteration, once during warmup),
        # and that counter's floor-division sets the lr applied at step s.
        eff_epoch = jnp.maximum(2 * (step - warmup_steps) + warmup_steps - 1, 0)
        decayed = base_lr * gamma ** (eff_epoch // max(decay_every, 1))
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
