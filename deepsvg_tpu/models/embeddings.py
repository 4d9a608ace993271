"""Input embeddings (reference: model/model.py:16-89), batch-first.

``SVGEmbedding`` fuses the command embedding, the per-argument embedding
(11 args x 64 dims -> one Linear to d_model), the optional group-index
embedding and a learned positional table. Two execution paths over the same
parameters:

- XLA: gathers + dense (training; supports dropout and single-token decode);
- Pallas (``attention_impl='pallas'``, deterministic): the argument
  embedding+projection folds into per-slot ``[vocab, D]`` tables and the whole
  sum is computed as one-hot matmuls in VMEM (ops/embedding.py) — ~8x faster
  than the gather lowering on TPU.

``ConstEmbedding`` provides the learned positional queries used by the
one-shot decoders; ``LabelEmbedding`` conditions on a class label.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
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
        b, s = commands.shape
        args_vocab = 2 * cfg.args_dim if self.rel_args else cfg.args_dim + 1
        max_len = self.seq_len + 2

        cmd_table = self.param(
            "command_embed", kaiming_embed_init(cfg.d_model),
            (cfg.n_commands, cfg.d_model),
        )
        arg_table = self.param(
            "arg_embed", kaiming_embed_init(64), (args_vocab, 64)
        )
        fcn_kernel = self.param(
            "embed_fcn_kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (64 * cfg.n_args, cfg.d_model),
        )
        fcn_bias = self.param("embed_fcn_bias", nn.initializers.zeros, (cfg.d_model,))
        group_table = None
        if self.use_group:
            group_len = self.group_len if self.group_len is not None else cfg.max_num_groups
            group_table = self.param(
                "group_embed", kaiming_embed_init(cfg.d_model),
                (group_len + 2, cfg.d_model),
            )
        pos_table = self.param(
            "pos_embed", kaiming_embed_init(cfg.d_model), (max_len, cfg.d_model)
        )

        # fused one-hot-matmul embedding — differentiable (custom VJP, table
        # grads as transposed one-hot matmuls), so training uses it too
        if cfg.attention_impl == "pallas" and pos_index is None:
            from ..ops.attention import pick_tile_b
            from ..ops.embedding import fold_arg_tables, fused_embedding_train

            arg_tables = fold_arg_tables(
                arg_table.astype(dtype), fcn_kernel.astype(dtype),
                fcn_bias.astype(dtype), cfg.n_args,
            )
            groups_arr = (
                groups.astype(jnp.int32) if self.use_group
                else jnp.zeros((b, s), jnp.int32)
            )
            gt = (
                group_table.astype(dtype) if group_table is not None
                else jnp.zeros((8, cfg.d_model), dtype)
            )
            src = fused_embedding_train(
                commands, args, groups_arr, cmd_table.astype(dtype), arg_tables,
                gt, pos_table[:s].astype(dtype),
                pick_tile_b(b, s), self.use_group, dtype, False,
            )
            return nn.Dropout(cfg.dropout, deterministic=deterministic)(src)

        cmd_emb = jnp.take(cmd_table.astype(dtype), commands.astype(jnp.int32), axis=0)
        arg_emb = jnp.take(
            arg_table.astype(dtype), (args + 1).astype(jnp.int32), axis=0
        ).reshape(b, s, 64 * cfg.n_args)
        src = cmd_emb + arg_emb @ fcn_kernel.astype(dtype) + fcn_bias.astype(dtype)

        if self.use_group:
            src = src + jnp.take(
                group_table.astype(dtype), groups.astype(jnp.int32), axis=0
            )

        if pos_index is not None:
            src = src + jax.lax.dynamic_slice_in_dim(
                pos_table.astype(dtype), pos_index, 1, axis=0
            )[None]
        else:
            src = src + pos_table[:s].astype(dtype)
        return nn.Dropout(cfg.dropout, deterministic=deterministic)(src)


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
