"""Transformer building blocks — flax.linen, batch-first ``[B, S, D]``.

These reproduce the reference's "improved" (pre-LN) layer semantics
(model/layers/improved_transformer.py):

- :class:`EncoderLayerImproved` — pre-LN self-attention + optional label
  injection + pre-LN feed-forward (improved_transformer.py:16-54).
- :class:`DecoderLayerGlobalImproved` — pre-LN self-attention, then the latent
  ``z`` injected as a per-layer learned linear broadcast (NO cross-attention;
  improved_transformer.py:97-141 — the architecturally unusual bit of DeepSVG).

Each layer owns its parameters directly (flat names) and executes through one
of three paths over the same tree:

- **fused** (``attn_impl='pallas'``, deterministic, no label): the whole layer
  — LN1, attention, residual, [latent injection], LN2, FF, residual — as ONE
  Pallas kernel (ops/layer.py), removing every intermediate HBM round-trip;
- **XLA**: plain jnp ops (training path; attention-weight + residual dropout);
- **cached decode**: KV-cached single-token step for autoregressive sampling.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _tile_target() -> int:
    """Dense row-tile target for the fused inference layers: 1024 on real
    TPUs (with auto 256-row attention sub-blocks, see ops/layer.py), 256 in
    CPU interpret mode where big tiles only cost test time."""
    return 256 if jax.default_backend() == "cpu" else 1024


def kaiming_embed_init(fan_in: int):
    """torch ``kaiming_normal_(mode='fan_in')`` on a [num, fan_in] table:
    std = sqrt(2 / fan_in)."""
    return nn.initializers.normal(stddev=(2.0 / fan_in) ** 0.5)


def _ln_params_init(key, shape, dtype=jnp.float32):
    """Stacked LayerNorm params [2, D]: row 0 scale (ones), row 1 bias (zeros)."""
    del key
    return jnp.stack([jnp.ones(shape[1:], dtype), jnp.zeros(shape[1:], dtype)])


def layer_norm(x, ln, eps: float = 1e-5):
    """Manual LayerNorm with stacked [2, D] params, computed in f32
    (epsilon matches torch for reference parity)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    out = xc * jax.lax.rsqrt(var + eps) * ln[0].astype(jnp.float32) + ln[1].astype(jnp.float32)
    return out.astype(x.dtype)


def key_padding_to_additive(key_padding_mask: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """``[B, S_k]`` bool (True = masked) -> additive ``[B, S_k]`` float."""
    if key_padding_mask is None:
        return None
    return jnp.where(key_padding_mask, -jnp.inf, 0.0)


def _pad_seq_for_kernel(x: jnp.ndarray, mask: jnp.ndarray, mult: int = 8):
    """Pad ``x [B, S, D]`` / additive ``mask [B, S]`` so S is a multiple of
    ``mult``. Odd sequence lengths (D1's S=31) put the fused kernels'
    attention sub-block row offsets off the 8/16-row sublane tile, forcing a
    vector relayout per block per head — measured 2.50 -> 2.17 ms/layer
    fwd+bwd at flagship D1 training shapes from this padding alone
    (scripts/exp_seq_align.py). Pad keys are masked -inf; pad rows are fully
    masked and produce exact zeros via the kernels' 0/0 guard, so outputs
    (sliced back) and every gradient are bit-identical to the unpadded
    computation."""
    s = x.shape[1]
    pad = (-s) % mult
    if pad == 0:
        return x, mask, s
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    mp = jnp.pad(mask, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    return xp, mp, s


class _TransformerLayerBase(nn.Module):
    """Shared parameter declaration + path dispatch for the two layer types."""

    d_model: int
    n_heads: int
    dim_feedforward: int
    dropout: float
    use_label: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    dim_label: int = 64

    def _params(self):
        d, dff = self.d_model, self.dim_feedforward
        init = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        p = {
            "norm1": self.param("norm1", _ln_params_init, (2, d)),
            "wqkv": self.param("wqkv", init, (d, 3 * d), jnp.float32),
            "bqkv": self.param("bqkv", zeros, (3 * d,), jnp.float32),
            "wo": self.param("wo", init, (d, d), jnp.float32),
            "bo": self.param("bo", zeros, (d,), jnp.float32),
            "norm2": self.param("norm2", _ln_params_init, (2, d)),
            "ff1_kernel": self.param("ff1_kernel", init, (d, dff), jnp.float32),
            "ff1_bias": self.param("ff1_bias", zeros, (dff,), jnp.float32),
            "ff2_kernel": self.param("ff2_kernel", init, (dff, d), jnp.float32),
            "ff2_bias": self.param("ff2_bias", zeros, (d,), jnp.float32),
        }
        if self.use_label:
            p["glob2_kernel"] = self.param("glob2_kernel", init, (self.dim_label, d), jnp.float32)
            p["glob2_bias"] = self.param("glob2_bias", zeros, (d,), jnp.float32)
        return {k: v.astype(self.dtype) for k, v in p.items()}

    def _attention_xla(self, xn, key_pad, causal, deterministic, p):
        """Differentiable attention (training + any non-fused inference).

        Under the Pallas backend this uses the custom-vjp fused kernels
        (forward AND backward in VMEM, dropout via the on-chip PRNG with the
        mask regenerated in backward — flash-style, nothing saved but the
        inputs). Elsewhere, the einsum formulation.

        Note: the pure-XLA block-packed variant (ops.attention.mha_blockpacked)
        was measured and is a net LOSS for training — its tile_b-times-larger
        probability tensors become backward residuals (docs/PERFORMANCE.md).
        """
        from ..ops.attention import mha_reference, pick_tile_b

        dropout_rate = self.dropout if not deterministic else 0.0
        rng = (
            self.make_rng("dropout") if dropout_rate > 0.0 else None
        )

        if self.attn_impl == "pallas":
            from ..ops.attention_vjp import fused_mha_train

            b, s, _ = xn.shape
            mask = (
                key_pad.astype(jnp.float32)
                if key_pad is not None else jnp.zeros((b, s), jnp.float32)
            )
            if rng is not None:
                seed = jax.random.randint(rng, (1,), 0, 2**30, jnp.int32)
            else:
                seed = jnp.zeros((1,), jnp.int32)
            return fused_mha_train(
                xn, p["wqkv"], p["bqkv"], p["wo"], p["bo"], mask, seed,
                self.n_heads, pick_tile_b(b, s), causal, dropout_rate,
            )

        return mha_reference(
            xn, p["wqkv"], p["bqkv"], p["wo"], p["bo"], key_pad, self.n_heads,
            causal=causal, dropout_rate=dropout_rate, dropout_rng=rng,
        )

    def _attention_cached(self, x_t, key_pad, decode_index, decode_len, p):
        """KV-cached single-token attention (x_t [B, 1, D])."""
        b = x_t.shape[0]
        d, h = self.d_model, self.n_heads
        hd = d // h
        qkv = x_t.reshape(b, d) @ p["wqkv"] + p["bqkv"]
        q, k_t, v_t = qkv[:, :d], qkv[:, d : 2 * d], qkv[:, 2 * d :]

        ck = self.variable("cache", "k", lambda: jnp.zeros((b, decode_len, d), self.dtype))
        cv = self.variable("cache", "v", lambda: jnp.zeros((b, decode_len, d), self.dtype))
        ck.value = jax.lax.dynamic_update_index_in_dim(
            ck.value, k_t.astype(self.dtype), decode_index, axis=1
        )
        cv.value = jax.lax.dynamic_update_index_in_dim(
            cv.value, v_t.astype(self.dtype), decode_index, axis=1
        )

        qh = q.reshape(b, h, hd) * (hd ** -0.5)
        kh = ck.value.reshape(b, decode_len, h, hd)
        scores = jnp.einsum("bhd,bkhd->bhk", qh, kh, preferred_element_type=jnp.float32)
        pos = jnp.arange(decode_len)
        scores = jnp.where((pos <= decode_index)[None, None, :], scores, -jnp.inf)
        if key_pad is not None:
            scores = scores + key_pad[:, None, :]
        prob = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        vh = cv.value.reshape(b, decode_len, h, hd)
        ctx = jnp.einsum("bhk,bkhd->bhd", prob, vh).reshape(b, d)
        return ((ctx @ p["wo"]) + p["bo"]).astype(self.dtype).reshape(b, 1, d)

    def _ffn_xla(self, x, deterministic, p):
        xn2 = layer_norm(x, p["norm2"])
        h = jnp.maximum(xn2 @ p["ff1_kernel"] + p["ff1_bias"], 0)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return h @ p["ff2_kernel"] + p["ff2_bias"]

    def _fused_train_layer(self, x, seq_bias, key_pad, causal, p):
        """Whole-layer fused forward+backward (ops/layer_vjp.py): custom-VJP
        Pallas kernels with in-kernel dropout (attention probabilities,
        attention output, FF hidden, FF output — the reference's four sites).
        ``seq_bias [B, D]`` carries the per-sequence injections, dropout
        already applied (their weight grads flow through this op's VJP).
        The backward reuses HBM-saved attention probs + FF hidden by default
        (ops.layer_vjp.SAVE_RESIDUALS_DEFAULT; measured 15% faster per layer
        than the flash-style recompute at S=32, docs/save_recompute_ab.json)."""
        from ..ops import layer_vjp
        from ..ops.attention import pick_tile_b
        from ..ops.layer_vjp import fused_layer_train

        b, s, _ = x.shape
        mask = (
            key_pad.astype(jnp.float32)
            if key_pad is not None else jnp.zeros((b, s), jnp.float32)
        )
        x, mask, s_orig = _pad_seq_for_kernel(x, mask)
        s = x.shape[1]
        if seq_bias is None:
            seq_bias = jnp.zeros((b, self.d_model), x.dtype)
        if self.dropout > 0.0 and self.has_rng("dropout"):
            seed = jax.random.randint(
                self.make_rng("dropout"), (1,), 0, 2**30, jnp.int32
            )
            rate = self.dropout
        else:
            seed = jnp.zeros((1,), jnp.int32)
            rate = 0.0
        out = fused_layer_train(
            x, seq_bias.astype(x.dtype), p["norm1"], p["wqkv"], p["bqkv"],
            p["wo"], p["bo"], p["norm2"], p["ff1_kernel"], p["ff1_bias"],
            p["ff2_kernel"], p["ff2_bias"], mask, seed,
            self.n_heads, pick_tile_b(b, s), causal, rate,
            None, False, layer_vjp.SAVE_RESIDUALS_DEFAULT,
        )
        return out[:, :s_orig, :]


class EncoderLayerImproved(_TransformerLayerBase):
    """Pre-LN encoder layer (improved_transformer.py:42-54)."""

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        key_pad: Optional[jnp.ndarray] = None,
        label_emb: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        collect_params: bool = False,
    ) -> jnp.ndarray:
        p = self._params()
        if collect_params:
            # stack-fused path (EncoderStack): declare this layer's params
            # (same tree as every other path) and hand them to the caller —
            # the L-layer computation runs as ONE kernel there
            return p
        b, s, _ = src.shape

        if self.attn_impl == "pallas" and deterministic:
            from ..ops.attention import pick_tile_b
            from ..ops.layer import fused_encoder_layer

            mask = (
                key_pad.astype(jnp.float32)
                if key_pad is not None else jnp.zeros((b, s), jnp.float32)
            )
            # no seq padding here: the inference kernel's blocks span the
            # full S (trailing dims == array dims, always lowerable), and
            # the alignment pad that wins 13% on the TRAIN kernels costs
            # 2.8% end-to-end at inference (r5 bisect of the r2->r3
            # regression: 24,114 -> 23,450 samples/s at commit ac76eb2,
            # re-benched same-day; pad rows are pure overhead when there is
            # no backward to relayout)
            seq_bias = None
            if self.use_label and label_emb is not None:
                le = label_emb[:, 0, :] if label_emb.ndim == 3 else label_emb
                seq_bias = le @ p["glob2_kernel"] + p["glob2_bias"]
            return fused_encoder_layer(
                src, p["norm1"], p["wqkv"], p["bqkv"], p["wo"], p["bo"],
                p["norm2"], p["ff1_kernel"], p["ff1_bias"], p["ff2_kernel"],
                p["ff2_bias"], mask, n_heads=self.n_heads,
                # 1024-row dense tiles + auto 256-row attention sub-blocks
                # (6% faster than coupled 256-row tiles, tile sweep); CPU
                # interpret mode keeps small tiles (compile/run time)
                tile_b=pick_tile_b(b, s, target_rows=_tile_target()),
                seq_bias=seq_bias,
            )

        if self.attn_impl == "pallas":  # fused train path (not deterministic)
            seq_bias = None
            if self.use_label and label_emb is not None:
                le = label_emb[:, 0, :] if label_emb.ndim == 3 else label_emb
                seq_bias = nn.Dropout(self.dropout, deterministic=False)(
                    le @ p["glob2_kernel"] + p["glob2_bias"]
                )
            return self._fused_train_layer(src, seq_bias, key_pad, False, p)

        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)
        xn = layer_norm(src, p["norm1"])
        src = src + drop(self._attention_xla(xn, key_pad, False, deterministic, p))

        if self.use_label and label_emb is not None:
            src = src + drop(label_emb @ p["glob2_kernel"] + p["glob2_bias"])

        return src + drop(self._ffn_xla(src, deterministic, p))


class DecoderLayerGlobalImproved(_TransformerLayerBase):
    """Pre-LN decoder layer with latent injection instead of cross-attention
    (improved_transformer.py:126-141): ``tgt += linear_global(z)`` broadcast
    over the sequence axis."""

    dim_z: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        z: jnp.ndarray,
        key_pad: Optional[jnp.ndarray] = None,
        causal: bool = False,
        label_emb: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        decode_index=None,
        decode_len: Optional[int] = None,
        collect_params: bool = False,
    ) -> jnp.ndarray:
        p = self._params()
        dz = self.dim_z if self.dim_z is not None else z.shape[-1]
        init = nn.initializers.lecun_normal()
        wg = self.param("glob_kernel", init, (dz, self.d_model), jnp.float32).astype(self.dtype)
        bg = self.param("glob_bias", nn.initializers.zeros, (self.d_model,), jnp.float32).astype(self.dtype)
        if collect_params:
            # stack-fused path (DecoderStack): params only, same tree
            return {**p, "glob_kernel": wg, "glob_bias": bg}

        z2 = z[:, 0, :] if z.ndim == 3 else z
        b, s, _ = tgt.shape

        if decode_index is not None:
            tgt1 = layer_norm(tgt, p["norm1"])
            tgt = tgt + self._attention_cached(tgt1, key_pad, decode_index, decode_len, p)
            tgt = tgt + (z2 @ wg + bg)[:, None, :]
            if self.use_label and label_emb is not None:
                tgt = tgt + (label_emb @ p["glob2_kernel"] + p["glob2_bias"])
            return tgt + self._ffn_xla(tgt, True, p)

        if self.attn_impl == "pallas" and deterministic:
            from ..ops.attention import pick_tile_b
            from ..ops.layer import fused_decoder_layer

            mask = (
                key_pad.astype(jnp.float32)
                if key_pad is not None else jnp.zeros((b, s), jnp.float32)
            )
            # unpadded on purpose — see the encoder branch: at inference the
            # S=31 one-shot decode runs 2.8% faster without alignment-pad
            # rows (r5 bisect), and the kernel lowers at any S
            extra_bias = None
            if self.use_label and label_emb is not None:
                le = label_emb[:, 0, :] if label_emb.ndim == 3 else label_emb
                extra_bias = le @ p["glob2_kernel"] + p["glob2_bias"]
            return fused_decoder_layer(
                tgt, z2, p["norm1"], p["wqkv"], p["bqkv"], p["wo"], p["bo"],
                wg, bg, p["norm2"], p["ff1_kernel"], p["ff1_bias"],
                p["ff2_kernel"], p["ff2_bias"], mask, n_heads=self.n_heads,
                tile_b=pick_tile_b(b, s, target_rows=_tile_target()),
                causal=causal, extra_bias=extra_bias,
            )

        if self.attn_impl == "pallas":  # fused train path (not deterministic)
            seq_bias = nn.Dropout(self.dropout, deterministic=False)(z2 @ wg + bg)
            if self.use_label and label_emb is not None:
                le = label_emb[:, 0, :] if label_emb.ndim == 3 else label_emb
                seq_bias = seq_bias + nn.Dropout(self.dropout, deterministic=False)(
                    le @ p["glob2_kernel"] + p["glob2_bias"]
                )
            return self._fused_train_layer(tgt, seq_bias, key_pad, causal, p)

        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)
        xn = layer_norm(tgt, p["norm1"])
        tgt = tgt + drop(self._attention_xla(xn, key_pad, causal, deterministic, p))
        tgt = tgt + drop((z2 @ wg + bg)[:, None, :])

        if self.use_label and label_emb is not None:
            tgt = tgt + drop(label_emb @ p["glob2_kernel"] + p["glob2_bias"])

        return tgt + drop(self._ffn_xla(tgt, deterministic, p))


# kill-switch for the stack-fused training path (ops/stack_vjp.py):
# interpret mode validates semantics but not Mosaic lowerability
# (docs/NOTES.md gotchas) — tests/experiments can flip this off to A/B
# against the per-layer kernels
STACK_FUSED_ENABLED = True


def _use_stack_fused(attn_impl, deterministic, n_layers, b, s):
    """Stack-fused training path gate: the short-sequence hierarchical
    stages only (rows small enough for the whole batch to live in VMEM;
    per-layer kernels stay optimal for the 32-token stages — their fixed
    cost is amortized there, docs/sol_table.json)."""
    s_pad = -(-s // 8) * 8
    # rows cap 512: the stack BACKWARD's f32 temps at 1024 rows measured
    # 25 MB of scoped VMEM vs the ~16 MB/core limit (on-chip Mosaic OOM,
    # scripts/exp_stack_ab.py) — B=60 recipe shapes (480 rows) fit
    return (STACK_FUSED_ENABLED
            and attn_impl == "pallas" and not deterministic and n_layers > 1
            and s_pad <= 16 and b * s_pad <= 512)


def _stacked_train(module, ps, x, seq_biases, key_pad, causal):
    """Run an L-layer stack as ONE fused kernel pair (ops/stack_vjp.py).

    ``ps``: per-layer param dicts (collect_params=True); ``seq_biases``:
    ``[L, B, D]`` pre-dropout-applied per-sequence injections or None.
    Dropout seeding mirrors _TransformerLayerBase._fused_train_layer."""
    from ..ops.stack_vjp import fused_stack_train

    b, s, d = x.shape
    # run the stack in the module's COMPUTE dtype: the stage-2 input arrives
    # f32 (the masked-mean pool upcasts), and an f32 stack backward at B=60
    # overflows the ~16 MB scoped VMEM by ~0.9 MB on chip (exp_stack_model_ab)
    # — bf16 activations halve every buffer and are the tpu_fast intent
    # (LN/softmax/accumulation stay f32 inside the kernels either way)
    in_dtype = x.dtype
    x = x.astype(module.dtype)
    mask = (key_pad.astype(jnp.float32) if key_pad is not None
            else jnp.zeros((b, s), jnp.float32))
    x, mask, s_orig = _pad_seq_for_kernel(x, mask)
    s = x.shape[1]
    L = len(ps)
    if seq_biases is None:
        seq_biases = jnp.zeros((L, b, d), x.dtype)
    if module.dropout > 0.0 and module.has_rng("dropout"):
        seed = jax.random.randint(
            module.make_rng("dropout"), (1,), 0, 2**30, jnp.int32)
        rate = module.dropout
    else:
        seed = jnp.zeros((1,), jnp.int32)
        rate = 0.0
    stk = lambda k: jnp.stack([p[k] for p in ps])          # noqa: E731
    row = lambda k: jnp.stack([p[k] for p in ps])[:, None, :]  # noqa: E731
    out = fused_stack_train(
        x, seq_biases.astype(x.dtype), stk("norm1"), stk("wqkv"),
        row("bqkv"), stk("wo"), row("bo"), stk("norm2"), stk("ff1_kernel"),
        row("ff1_bias"), stk("ff2_kernel"), row("ff2_bias"), mask, seed,
        module.n_heads, causal, rate)
    return out[:, :s_orig, :].astype(in_dtype)


def _label_biases(module, ps, label_emb):
    """Per-layer label-conditioning injections ``[L, B, D]``, dropout
    applied (one draw over the stacked tensor = independent per-layer
    masks, matching the per-layer modules distributionally)."""
    if not (module.use_label and label_emb is not None):
        return None
    le = label_emb[:, 0, :] if label_emb.ndim == 3 else label_emb
    bias = (jnp.einsum("bd,ldm->lbm", le, jnp.stack(
        [p["glob2_kernel"] for p in ps]))
        + jnp.stack([p["glob2_bias"] for p in ps])[:, None, :])
    return nn.Dropout(module.dropout, deterministic=False)(bias)


class EncoderStack(nn.Module):
    """N encoder layers + final LayerNorm (reference TransformerEncoder,
    layers/transformer.py with norm)."""

    n_layers: int
    d_model: int
    n_heads: int
    dim_feedforward: int
    dropout: float
    use_label: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, src, key_pad=None, label_emb=None, deterministic=True):
        layers = [
            EncoderLayerImproved(
                self.d_model, self.n_heads, self.dim_feedforward, self.dropout,
                self.use_label, self.dtype, self.attn_impl, name=f"layer_{i}",
            )
            for i in range(self.n_layers)
        ]
        b, s, _ = src.shape
        if _use_stack_fused(self.attn_impl, deterministic, self.n_layers,
                            b, s):
            ps = [lay(None, collect_params=True) for lay in layers]
            src = _stacked_train(self, ps, src,
                                 _label_biases(self, ps, label_emb),
                                 key_pad, False)
        else:
            for lay in layers:
                src = lay(src, key_pad=key_pad, label_emb=label_emb,
                          deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(src)


class DecoderStack(nn.Module):
    """N global-conditioned decoder layers + final LayerNorm."""

    n_layers: int
    d_model: int
    n_heads: int
    dim_feedforward: int
    dropout: float
    use_label: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, tgt, z, key_pad=None, causal=False, label_emb=None,
                 deterministic=True, decode_index=None, decode_len=None):
        layers = [
            DecoderLayerGlobalImproved(
                self.d_model, self.n_heads, self.dim_feedforward, self.dropout,
                self.use_label, self.dtype, self.attn_impl, name=f"layer_{i}",
            )
            for i in range(self.n_layers)
        ]
        b, s, _ = tgt.shape
        if (decode_index is None
                and _use_stack_fused(self.attn_impl, deterministic,
                                     self.n_layers, b, s)):
            ps = [lay(None, z, collect_params=True) for lay in layers]
            z2 = z[:, 0, :] if z.ndim == 3 else z
            # per-layer latent injections [L, B, D], dropout applied (one
            # draw across the stack = independent per-layer masks)
            biases = (jnp.einsum(
                "bd,ldm->lbm", z2.astype(self.dtype),
                jnp.stack([p["glob_kernel"] for p in ps]))
                + jnp.stack([p["glob_bias"] for p in ps])[:, None, :])
            biases = nn.Dropout(self.dropout, deterministic=False)(biases)
            lb = _label_biases(self, ps, label_emb)
            if lb is not None:
                biases = biases + lb
            tgt = _stacked_train(self, ps, tgt, biases, key_pad, causal)
        else:
            for lay in layers:
                tgt = lay(tgt, z, key_pad=key_pad, causal=causal,
                          label_emb=label_emb, deterministic=deterministic,
                          decode_index=decode_index, decode_len=decode_len)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(tgt)


class PositionalEncodingLUT(nn.Module):
    """Learned positional table added to the input, then dropout
    (reference: layers/positional_encoding.py:24-43)."""

    max_len: int
    d_model: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 index=None) -> jnp.ndarray:
        table = self.param(
            "pos_embed", kaiming_embed_init(self.d_model), (self.max_len, self.d_model)
        )
        if index is not None:
            # single-position lookup (KV-cached decoding): x [B, 1, D]
            x = x + jax.lax.dynamic_slice_in_dim(
                table.astype(self.dtype), index, 1, axis=0
            )[None]
        else:
            s = x.shape[-2]
            x = x + table[:s].astype(self.dtype)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)
