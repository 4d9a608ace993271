"""The SVG Transformer family — hierarchical VAE over SVG command sequences.

Reference architecture: deepsvg/model/model.py (SVGTransformer, 288-479).
This is a batch-first re-design: the reference's ``[S, G, N]`` seq-first layout
and ``_pack_group_batch`` permutes (utils/utils.py:20-49) become plain
``[N, G, S] -> [N*G, S]`` leading-axis reshapes (free for XLA); per-sample
boolean indexing becomes masked arithmetic; the Hungarian assignment cost
matrix is computed fully batched on-device (models/matching.py).

Stages:
  E1 (per-path encoder) -> masked mean pool -> E2 (per-document encoder over
  path latents, visibility-masked) -> ResNet -> VAE / linear bottleneck ->
  D2 (learned group queries + latent-injected decoder -> visibility + per-path
  latents) -> D1 (per-path decoder) -> FCN heads (command + argument logits).

All four reference variants are supported: one/two-stage encode/decode,
one-shot vs autoregressive prediction, ordered vs Hungarian (self_match)
assignment, and label conditioning.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..svgtensor import masks as M
from .config import ModelConfig
from .embeddings import ConstEmbedding, LabelEmbedding, SVGEmbedding
from .layers import (
    DecoderStack,
    EncoderStack,
    PositionalEncodingLUT,
    key_padding_to_additive,
)


def _fold(x: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """[N, G, ...] -> [N*G, ...] (the batch-first analog of _pack_group_batch)."""
    if x is None:
        return None
    return x.reshape((-1,) + x.shape[2:])


def _unfold(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """[N*G, ...] -> [N, G, ...]."""
    return x.reshape((n, -1) + x.shape[1:])


class ResNet(nn.Module):
    """4 residual FC blocks (reference basic_blocks.py:42-65)."""

    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        for i in range(1, 5):
            z = z + nn.relu(
                nn.Dense(self.d_model, dtype=self.dtype, name=f"linear{i}")(z)
            )
        return z


class VAE(nn.Module):
    """Gaussian reparametrized bottleneck (model/model.py:167-187)."""

    dim_z: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, sample: bool = True):
        init = nn.initializers.normal(stddev=0.001)
        mu = nn.Dense(self.dim_z, kernel_init=init, dtype=self.dtype, name="enc_mu_fcn")(z)
        logsigma = nn.Dense(
            self.dim_z, kernel_init=init, dtype=self.dtype, name="enc_sigma_fcn"
        )(z)
        if sample:
            sigma = jnp.exp(logsigma / 2.0)
            eps = jax.random.normal(self.make_rng("vae"), sigma.shape, sigma.dtype)
            z = mu + sigma * eps
        else:
            z = mu
        return z, mu, logsigma


class Bottleneck(nn.Module):
    """Plain linear bottleneck (model/model.py:190-197) — note the flagship
    ``hierarchical_ordered`` config uses this, not the VAE (use_vae=False)."""

    dim_z: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.dim_z, dtype=self.dtype, name="bottleneck")(z)


class FCN(nn.Module):
    """Command + argument classification heads (basic_blocks.py:5-23).

    ``argmax=True`` switches to the fused head+argmax kernel (ops/head.py):
    ids come back directly without materializing the [.., n_args, args_dim]
    logits tensor (greedy-sampling hot path). ``ce_targets`` switches the
    argument head to the fused softmax-CE kernel (ops/ce.py): the second
    return value is then the per-token-per-slot CE ``[.., n_args]`` instead
    of logits — the training hot path's memory wall removed."""

    d_model: int
    n_commands: int
    n_args: int
    args_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, out: jnp.ndarray, argmax: bool = False, ce_targets=None,
                 raw: bool = False):
        init = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        wc = self.param("command_kernel", init, (self.d_model, self.n_commands), jnp.float32)
        bc = self.param("command_bias", zeros, (self.n_commands,), jnp.float32)
        wa = self.param("args_kernel", init, (self.d_model, self.n_args * self.args_dim), jnp.float32)
        ba = self.param("args_bias", zeros, (self.n_args * self.args_dim,), jnp.float32)
        wc, bc = wc.astype(self.dtype), bc.astype(self.dtype)
        wa, ba = wa.astype(self.dtype), ba.astype(self.dtype)

        if argmax:
            from ..ops.head import fused_head_argmax

            lead = out.shape[:-1]
            x = out.reshape(-1, self.d_model)
            tile = 512  # largest power-of-two row tile that divides the batch
            while tile > 8 and x.shape[0] % tile != 0:
                tile //= 2
            ids = fused_head_argmax(
                x, wc, bc, wa, ba, n_commands=self.n_commands,
                n_args=self.n_args, tile_rows=tile,
            )
            cmd_ids = ids[:, 0].reshape(lead)
            args_ids = ids[:, 1:].reshape(lead + (self.n_args,))
            return cmd_ids, args_ids

        cmd_logits = out @ wc + bc
        if raw:
            # self-match fused path: hand back the states + argument-head
            # weights so the caller can run the pairwise-cost and fused-CE
            # kernels (ops/ce.py) without materializing the argument logits
            return cmd_logits, (out, wa, ba)
        if ce_targets is not None:
            from ..ops.ce import args_ce

            return cmd_logits, args_ce(out, wa, ba, ce_targets)
        args_logits = out @ wa + ba
        args_logits = args_logits.reshape(out.shape[:-1] + (self.n_args, self.args_dim))
        return cmd_logits, args_logits


class HierarchFCN(nn.Module):
    """Per-group visibility + latent heads (basic_blocks.py:26-39)."""

    dim_z: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, out: jnp.ndarray):
        visibility_logits = nn.Dense(2, dtype=self.dtype, name="visibility_fcn")(out)
        z = nn.Dense(self.dim_z, dtype=self.dtype, name="z_fcn")(out)
        return visibility_logits, z


class LSTMEncoder(nn.Module):
    """Bidirectional LSTM alternative to E1 (model/model.py:111,138-148):
    concat of forward/backward hidden (d_model/2 each), read at the last valid
    timestep."""

    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src: jnp.ndarray, seq_lens: jnp.ndarray) -> jnp.ndarray:
        half = self.d_model // 2
        fwd = nn.RNN(nn.OptimizedLSTMCell(half), name="lstm_fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(half), reverse=True, keep_order=True,
                     name="lstm_bwd")
        out = jnp.concatenate(
            [fwd(src, seq_lengths=seq_lens), bwd(src, seq_lengths=seq_lens)], axis=-1
        )
        idx = jnp.clip(seq_lens - 1, 0, None)[:, None, None]
        return jnp.take_along_axis(out, jnp.broadcast_to(idx, (out.shape[0], 1, out.shape[2])), axis=1)[:, 0]


class LSTMDecoder(nn.Module):
    """LSTM alternative decoder (model/model.py:231-241): initial (h, c) from
    tanh(fc_hc(z)), teacher-forced scan."""

    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        hc = jnp.tanh(nn.Dense(2 * self.d_model, dtype=self.dtype, name="fc_hc")(z))
        h, c = jnp.split(hc, 2, axis=-1)
        rnn = nn.RNN(nn.OptimizedLSTMCell(self.d_model), name="lstm")
        return rnn(src, initial_carry=(c, h))


class Encoder(nn.Module):
    """E1 (+ optional E2) encoder (model/model.py:92-164).

    Input ``commands [N, G, S]``, ``args [N, G, S, n_args]`` (G=1 for one-stage
    grouped inputs). Returns ``z [N, d_model]``.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, commands, args, label=None, deterministic=True):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        n, g, s = commands.shape
        use_group = cfg.encode_stages == 1

        label_emb = (
            LabelEmbedding(cfg, name="label_embedding")(label)
            if cfg.label_condition else None
        )

        if cfg.encode_stages == 2:
            vis = M.visibility_mask(commands)          # [N, G]
            key_vis = ~vis

        commands_f, args_f = _fold(commands), _fold(args)  # [N*G, S]
        pad = M.padding_mask(commands_f)                    # [N*G, S] float
        key_pad = key_padding_to_additive(M.key_padding_mask(commands_f))  # [N*G, S]
        groups_f = M.group_mask(commands_f) if use_group else None

        seq_len = cfg.max_seq_len if cfg.encode_stages == 2 else cfg.max_total_len
        src = SVGEmbedding(cfg, seq_len, use_group=use_group, name="embedding")(
            commands_f, args_f, groups_f, deterministic=deterministic
        )

        l1 = (
            jnp.repeat(label_emb, g, axis=0)[:, None, :]
            if label_emb is not None else None
        )
        if cfg.model_type == "transformer":
            memory = EncoderStack(
                cfg.n_layers, cfg.d_model, cfg.n_heads, cfg.dim_feedforward,
                cfg.dropout, cfg.label_condition, dtype, cfg.attention_impl,
                name="encoder",
            )(src, key_pad=key_pad, label_emb=l1, deterministic=deterministic)
            # masked mean pool over valid (pre-EOS) positions
            z = jnp.sum(memory * pad[..., None], axis=1) / jnp.maximum(
                jnp.sum(pad, axis=1, keepdims=True), 1.0
            )  # [N*G, d]
        else:  # lstm
            seq_lens = jnp.sum(pad, axis=1).astype(jnp.int32)
            z = LSTMEncoder(cfg.d_model, dtype, name="encoder")(src, seq_lens)

        z = _unfold(z, n)  # [N, G, d]

        if cfg.encode_stages == 2:
            src2 = z
            if not cfg.self_match:
                src2 = PositionalEncodingLUT(
                    cfg.max_num_groups, cfg.d_model, cfg.dropout, dtype,
                    name="hierarchical_PE",
                )(src2, deterministic=deterministic)
            l2 = label_emb[:, None, :] if label_emb is not None else None
            memory2 = EncoderStack(
                cfg.n_layers, cfg.d_model, cfg.n_heads, cfg.dim_feedforward,
                cfg.dropout, cfg.label_condition, dtype, cfg.attn_impl_hier,
                name="hierarchical_encoder",
            )(src2, key_pad=key_padding_to_additive(key_vis), label_emb=l2,
              deterministic=deterministic)
            visf = vis.astype(memory2.dtype)
            z = jnp.sum(memory2 * visf[..., None], axis=1) / jnp.maximum(
                jnp.sum(visf, axis=1, keepdims=True), 1.0
            )  # [N, d]
        else:
            z = z[:, 0]  # G == 1

        return z


class Decoder(nn.Module):
    """D2 (+ D1) decoder (model/model.py:200-285).

    ``z [N, dim_z]`` -> logits; for two-stage, also visibility logits.
    Teacher-forcing inputs ``commands/args [N, G, S_dec]`` are only used in
    autoregressive mode.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, z, commands=None, args=None, label=None, deterministic=True,
                 decode_index=None, decode_groups=None, decode_key_pad=None,
                 argmax_head=False, ce_targets=None, match_targets=None):
        """``decode_index`` switches to the KV-cached single-token mode:
        ``commands/args`` then hold only the token at that position
        (``[N, G, 1]``) and ``decode_groups`` its running moveto count."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        n = z.shape[0]

        label_emb = (
            LabelEmbedding(cfg, name="label_embedding")(label)
            if cfg.label_condition else None
        )
        l2 = label_emb[:, None, :] if label_emb is not None else None

        hierarch_logits = None
        if cfg.decode_stages == 2:
            src = ConstEmbedding(cfg, cfg.n_groups_prop, name="hierarchical_embedding")(
                n, deterministic=deterministic
            )
            out = DecoderStack(
                cfg.n_layers_decode, cfg.d_model, cfg.n_heads, cfg.dim_feedforward,
                cfg.dropout, cfg.label_condition, dtype, cfg.attn_impl_hier,
                name="hierarchical_decoder",
            )(src, z[:, None, :], label_emb=l2, deterministic=deterministic)
            hierarch_logits, z_groups = HierarchFCN(
                cfg.dim_z, dtype, name="hierarchical_fcn"
            )(out)  # [N, P, 2], [N, P, dim_z]
            zb = _fold(z_groups)  # [N*P, dim_z]
            n_groups = cfg.n_groups_prop
        else:
            zb = z
            n_groups = 1

        if label_emb is not None:
            lb = jnp.repeat(label_emb, n_groups, axis=0)[:, None, :]
        else:
            lb = None

        if cfg.pred_mode == "autoregressive":
            commands_f, args_f = _fold(commands), _fold(args)  # [N*G, S_dec]
            if decode_index is not None:
                # KV-cached token step: embed the single token at decode_index
                groups_f = _fold(decode_groups)
                src = SVGEmbedding(
                    cfg, cfg.max_total_len, rel_args=cfg.rel_targets, use_group=True,
                    group_len=cfg.max_total_len, name="embedding",
                )(commands_f, args_f, groups_f, deterministic=deterministic,
                  pos_index=decode_index)
                out = DecoderStack(
                    cfg.n_layers_decode, cfg.d_model, cfg.n_heads, cfg.dim_feedforward,
                    cfg.dropout, cfg.label_condition, dtype, cfg.attention_impl,
                    name="decoder",
                )(src, zb[:, None, :], key_pad=_fold(decode_key_pad),
                  label_emb=lb, deterministic=deterministic,
                  decode_index=decode_index, decode_len=cfg.max_total_len + 1)
            else:
                groups_f = M.group_mask(commands_f)
                src = SVGEmbedding(
                    cfg, cfg.max_total_len, rel_args=cfg.rel_targets, use_group=True,
                    group_len=cfg.max_total_len, name="embedding",
                )(commands_f, args_f, groups_f, deterministic=deterministic)
                key_pad = key_padding_to_additive(M.key_padding_mask(commands_f))
                if cfg.model_type == "transformer":
                    out = DecoderStack(
                        cfg.n_layers_decode, cfg.d_model, cfg.n_heads,
                        cfg.dim_feedforward, cfg.dropout, cfg.label_condition,
                        dtype, cfg.attention_impl, name="decoder",
                    )(src, zb[:, None, :], key_pad=key_pad, causal=True,
                      label_emb=lb, deterministic=deterministic)
                else:  # lstm
                    out = LSTMDecoder(cfg.d_model, dtype, name="decoder")(src, zb)
        else:  # one_shot
            seq_len = cfg.max_seq_len + 1 if cfg.decode_stages == 2 else cfg.max_total_len + 1
            src = ConstEmbedding(cfg, seq_len, name="embedding")(
                zb.shape[0], deterministic=deterministic
            )
            out = DecoderStack(
                cfg.n_layers_decode, cfg.d_model, cfg.n_heads, cfg.dim_feedforward,
                cfg.dropout, cfg.label_condition, dtype, cfg.attention_impl,
                name="decoder",
            )(src, zb[:, None, :], label_emb=lb, deterministic=deterministic)

        fcn = FCN(
            cfg.d_model, cfg.n_commands, cfg.n_args, cfg.args_dim_out, dtype,
            name="fcn",
        )

        if match_targets is not None:
            # fused self-match: score every (proposal, target) pair and the
            # final CE straight off the decoder states (ops/ce.py) — neither
            # the matching cost nor the loss materializes argument logits.
            # Equivalent to the reference's permute-the-logits formulation
            # (model/model.py:384-394) with the permutation applied to the
            # TARGETS instead (CE is elementwise in the pairing, so
            # loss(logits[perm], tgt) == loss(logits, tgt[argsort(perm)])).
            from ..ops.ce import args_ce
            from .matching import fused_perfect_matching

            tgt_c, tgt_a = match_targets
            cmd_logits, (states, wa, ba) = fcn(out, raw=True)
            cmd_logits = _unfold(cmd_logits, n)      # [N, P, S, n_commands]
            assignment = fused_perfect_matching(
                _unfold(states, n), wa, ba, cmd_logits, hierarch_logits,
                tgt_c, tgt_a, cfg,
            )                                        # [N, P]
            inv = jnp.argsort(assignment, axis=1)
            tgt_c_p = jnp.take_along_axis(tgt_c, inv[:, :, None], axis=1)
            tgt_a_p = jnp.take_along_axis(
                tgt_a, inv[:, :, None, None], axis=1
            )
            ce = args_ce(
                states, wa, ba,
                _fold((tgt_a_p[..., 1:, :] + 1).astype(jnp.int32)),
            )                                        # [N*P, S, n_args]
            return cmd_logits, _unfold(ce, n), hierarch_logits, (tgt_c_p, tgt_a_p)

        cmd_logits, args_logits = fcn(
            out, argmax=argmax_head,
            ce_targets=_fold(ce_targets) if ce_targets is not None else None)

        cmd_logits = _unfold(cmd_logits, n)      # [N, G, S, (n_commands)]
        args_logits = _unfold(args_logits, n)    # [N, G, S, n_args(, args_dim_out)]
        return cmd_logits, args_logits, hierarch_logits


class SVGTransformer(nn.Module):
    """Top-level model (model/model.py:288-479).

    ``__call__`` is the training/teacher-forcing forward; ``encode`` returns the
    latent; sampling lives in ``deepsvg_tpu.models.sample``.
    """

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        if cfg.encode_stages > 0:
            self.encoder = Encoder(cfg)
            if cfg.use_resnet:
                self.resnet = ResNet(cfg.d_model, dtype)
            if cfg.use_vae:
                self.vae = VAE(cfg.dim_z, dtype)
            else:
                self.bottleneck = Bottleneck(cfg.dim_z, dtype)
        self.decoder = Decoder(cfg)

    def decode_step(self, z, cmd_t, args_t, groups_t, decode_index,
                    decode_key_pad=None, label=None):
        """One KV-cached autoregressive decoder step (jit under
        ``mutable=['cache']``): token at ``decode_index`` in, logits for the
        next position out. ``groups_t`` is the running moveto count."""
        return self.decoder(
            z, cmd_t, args_t, label, deterministic=True,
            decode_index=decode_index, decode_groups=groups_t,
            decode_key_pad=decode_key_pad,
        )

    def encode(self, commands, args, label=None, deterministic=True, sample_vae=True):
        """Input -> latent ``z [N, dim_z]`` (+ (mu, logsigma) if VAE)."""
        cfg = self.cfg
        z = self.encoder(commands, args, label, deterministic=deterministic)
        if cfg.use_resnet:
            z = self.resnet(z)
        if cfg.use_vae:
            z, mu, logsigma = self.vae(z, sample=sample_vae)
            return z, mu, logsigma
        return self.bottleneck(z), None, None

    def __call__(
        self,
        commands_enc=None,
        args_enc=None,
        commands_dec=None,
        args_dec=None,
        label=None,
        z=None,
        return_tgt=True,
        encode_mode=False,
        deterministic=True,
        sample_vae=True,
        argmax_head=False,
        fused_ce=False,
    ):
        cfg = self.cfg
        mu = logsigma = None
        if z is None:
            z, mu, logsigma = self.encode(
                commands_enc, args_enc, label, deterministic, sample_vae
            )
        if encode_mode:
            return z

        if return_tgt:  # teacher forcing: drop the last target position
            commands_dec_ = commands_dec[..., :-1]
            args_dec_ = args_dec[..., :-1, :]
        else:
            commands_dec_, args_dec_ = commands_dec, args_dec

        # fused softmax-CE over the argument head (ops/ce.py). For the
        # self-match (Hungarian) variant the decoder runs the fused pairwise
        # cost + matching internally and returns targets permuted instead of
        # logits (equivalent pairing) — no argument logits in either case.
        use_fused_ce = fused_ce and return_tgt
        fused_match = use_fused_ce and cfg.self_match
        ce_targets = (
            (args_dec[..., 1:, :] + 1).astype(jnp.int32)
            if use_fused_ce and not cfg.self_match else None
        )

        dec_out = self.decoder(
            z, commands_dec_, args_dec_, label, deterministic=deterministic,
            argmax_head=argmax_head, ce_targets=ce_targets,
            match_targets=(commands_dec, args_dec) if fused_match else None,
        )
        if fused_match:
            cmd_logits, args_ce_v, hierarch_logits, (tgt_c_p, tgt_a_p) = dec_out
            res = {
                "command_logits": cmd_logits,
                "args_ce": args_ce_v,
                "visibility_logits": hierarch_logits,
                "tgt_commands": tgt_c_p,
                "tgt_args": tgt_a_p,
            }
            if cfg.use_vae:
                res["mu"] = mu
                res["logsigma"] = logsigma
            return res
        cmd_logits, args_logits, hierarch_logits = dec_out

        if return_tgt and cfg.self_match:
            # Hungarian re-ordering of proposals to targets (model.py:384-394)
            from .matching import apply_assignment, perfect_matching

            assignment = perfect_matching(
                cmd_logits, args_logits, hierarch_logits,
                commands_dec, args_dec, cfg,
            )
            cmd_logits, args_logits, hierarch_logits = apply_assignment(
                assignment, cmd_logits, args_logits, hierarch_logits
            )

        key_c = "command_ids" if argmax_head else "command_logits"
        if argmax_head:
            key_a = "args_ids"
        elif use_fused_ce:
            key_a = "args_ce"
        else:
            key_a = "args_logits"
        res = {
            key_c: cmd_logits,
            key_a: args_logits,
        }
        if cfg.decode_stages == 2:
            res["visibility_logits"] = hierarch_logits
        if return_tgt:
            res["tgt_commands"] = commands_dec
            res["tgt_args"] = args_dec
            if cfg.use_vae:
                res["mu"] = mu
                res["logsigma"] = logsigma
        return res
