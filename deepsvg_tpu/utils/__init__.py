"""Small shared utilities (reference: deepsvg/utils/utils.py oddments)."""
from __future__ import annotations

import contextlib
import random
from typing import Iterator

import numpy as np


def set_seed(seed: int = 42):
    """Global host-side seeding (reference train_utils.py:224-230). JAX device
    randomness is explicit-key based and seeded separately."""
    random.seed(seed)
    np.random.seed(seed)


def count_parameters(params) -> int:
    """Total parameter count of a pytree (reference train_utils.py:159)."""
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def linear(v0: float, v1: float, x: float, x0: float, x1: float) -> float:
    """Clamped linear ramp (reference utils/utils.py:4-13)."""
    if x <= x0:
        return v0
    if x >= x1:
        return v1
    return v0 + (v1 - v0) * (x - x0) / (x1 - x0)


def infinite_range(start: int = 0) -> Iterator[int]:
    """(reference train_utils.py:233)"""
    i = start
    while True:
        yield i
        i += 1


def batchify(arrays, device=None):
    """Add a leading batch axis to each array (reference utils/utils.py:16)."""
    import jax.numpy as jnp

    return tuple(jnp.asarray(np.asarray(a))[None] for a in arrays)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context around a training/eval region — the
    framework's op-level tracing hook (SURVEY §5 tracing parity)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
