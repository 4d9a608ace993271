"""Input embeddings (reference: model/model.py:16-89), batch-first.

``SVGEmbedding`` fuses the command embedding, the per-argument embedding
(11 args x 64 dims -> one Linear to d_model) and a learned positional table;
``ConstEmbedding`` provides the learned positional queries used by the
one-shot decoders; ``LabelEmbedding`` conditions on a class label.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .config import ModelConfig
from .layers import PositionalEncodingLUT, kaiming_embed_init


class SVGEmbedding(nn.Module):
    """Command + argument + (optional) group-index + positional embedding
    (model/model.py:16-57). Input ``commands [B, S]``, ``args [B, S, n_args]``
    (args carry PAD_VAL=-1; the lookup shifts indices by +1)."""

    cfg: ModelConfig
    seq_len: int                 # content length; table covers seq_len + 2
    rel_args: bool = False
    use_group: bool = False
    group_len: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        commands: jnp.ndarray,
        args: jnp.ndarray,
        groups: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        pos_index=None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)

        cmd_emb = nn.Embed(
            cfg.n_commands, cfg.d_model,
            embedding_init=kaiming_embed_init(cfg.d_model),
            dtype=dtype, name="command_embed",
        )(commands.astype(jnp.int32))

        args_vocab = 2 * cfg.args_dim if self.rel_args else cfg.args_dim + 1
        arg_emb = nn.Embed(
            args_vocab, 64,
            embedding_init=kaiming_embed_init(64),
            dtype=dtype, name="arg_embed",
        )((args + 1).astype(jnp.int32))  # +1: PAD_VAL -1 -> index 0
        b, s = commands.shape
        arg_emb = arg_emb.reshape(b, s, 64 * cfg.n_args)
        arg_emb = nn.Dense(
            cfg.d_model,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            dtype=dtype, name="embed_fcn",
        )(arg_emb)

        src = cmd_emb + arg_emb

        if self.use_group:
            group_len = self.group_len if self.group_len is not None else cfg.max_num_groups
            src = src + nn.Embed(
                group_len + 2, cfg.d_model,
                embedding_init=kaiming_embed_init(cfg.d_model),
                dtype=dtype, name="group_embed",
            )(groups.astype(jnp.int32))

        return PositionalEncodingLUT(
            self.seq_len + 2, cfg.d_model, cfg.dropout, dtype, name="pos_encoding"
        )(src, deterministic=deterministic, index=pos_index)


class ConstEmbedding(nn.Module):
    """Learned positional queries for one-shot decoding (model/model.py:60-73):
    the positional table applied to zeros, broadcast over the batch."""

    cfg: ModelConfig
    seq_len: int

    @nn.compact
    def __call__(self, batch_size: int, deterministic: bool = True) -> jnp.ndarray:
        dtype = jnp.dtype(self.cfg.compute_dtype)
        zeros = jnp.zeros((batch_size, self.seq_len, self.cfg.d_model), dtype)
        return PositionalEncodingLUT(
            self.seq_len, self.cfg.d_model, self.cfg.dropout, dtype, name="PE"
        )(zeros, deterministic=deterministic)


class LabelEmbedding(nn.Module):
    """Class-label embedding (model/model.py:76-89)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, label: jnp.ndarray) -> jnp.ndarray:
        return nn.Embed(
            self.cfg.n_labels, self.cfg.dim_label,
            embedding_init=kaiming_embed_init(self.cfg.dim_label),
            dtype=jnp.dtype(self.cfg.compute_dtype), name="label_embedding",
        )(label.astype(jnp.int32))
