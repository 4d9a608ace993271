"""Mask derivations over command sequences — pure JAX, batch-first.

All functions take ``commands`` with the sequence on the **last** axis
(shape ``[..., S]``) and are jit/vmap-friendly (static shapes, no Python
branching on values).

Reference semantics: deepsvg/model/utils.py:7-72 (which is seq-first; this
rebuild is batch-first so no transposes are ever needed).
"""
from __future__ import annotations

import jax.numpy as jnp

from .constants import CMD_EOS, CMD_M


def padding_mask(commands: jnp.ndarray, extended: bool = False) -> jnp.ndarray:
    """1.0 for positions strictly before the first EOS, else 0.0.

    With ``extended=True``, the mask additionally includes any position whose
    index-minus-3 was in the base mask, i.e. it is extended by up to 3 steps past
    the first EOS. The reference comment (model/utils.py:26) says "extend by 1"
    but the code (``narrow(dim, 3, S-3)``) shifts by 3; we reproduce the code,
    not the comment, for loss parity.

    Args:
        commands: integer array ``[..., S]``.

    Returns:
        float32 array ``[..., S]``.
    """
    is_eos = (commands == CMD_EOS).astype(jnp.int32)
    mask = (jnp.cumsum(is_eos, axis=-1) == 0).astype(jnp.float32)
    if extended:
        shifted = jnp.pad(mask[..., :-3], [(0, 0)] * (mask.ndim - 1) + [(3, 0)])
        mask = jnp.clip(mask + shifted, max=1.0)
    return mask


def key_padding_mask(commands: jnp.ndarray) -> jnp.ndarray:
    """True at padded key positions (first EOS onwards). ``[..., S]`` bool."""
    is_eos = (commands == CMD_EOS).astype(jnp.int32)
    return jnp.cumsum(is_eos, axis=-1) > 0


def group_mask(commands: jnp.ndarray) -> jnp.ndarray:
    """Running count of moveto commands — the group id of each position.

    ``[..., S]`` int32. Reference: model/utils.py:35-42.
    """
    return jnp.cumsum((commands == CMD_M).astype(jnp.int32), axis=-1)


def visibility_mask(commands: jnp.ndarray) -> jnp.ndarray:
    """True if the sequence contains any real content.

    A group is visible iff it has fewer than S-1 EOS tokens (an empty padded
    group is ``[SOS, EOS*...]`` with S-1 EOS). Reduces over the sequence axis:
    ``[..., S] -> [...]`` bool. Reference: model/utils.py:45-56.
    """
    s = commands.shape[-1]
    n_eos = jnp.sum((commands == CMD_EOS).astype(jnp.int32), axis=-1)
    return n_eos < s - 1


def key_visibility_mask(commands: jnp.ndarray) -> jnp.ndarray:
    """True at *invisible* (all-padding) groups — attention key mask form."""
    return ~visibility_mask(commands)


def causal_mask(seq_len: int) -> jnp.ndarray:
    """Additive causal attention mask ``[S, S]``: 0 where allowed, -inf above diagonal."""
    return jnp.where(
        jnp.tril(jnp.ones((seq_len, seq_len), dtype=bool)),
        0.0,
        -jnp.inf,
    ).astype(jnp.float32)


def sequence_lengths(commands: jnp.ndarray) -> jnp.ndarray:
    """Number of non-padding positions (before the first EOS). ``[...]`` int32."""
    return jnp.sum(padding_mask(commands), axis=-1).astype(jnp.int32)
