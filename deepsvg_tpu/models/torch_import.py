"""Import reference (PyTorch) checkpoints into this framework.

The reference publishes pretrained weights as ``.pth.tar`` files holding
``{"model": state_dict, "cfg": {...}, ...}`` (reference
utils/train_utils.py:10-73 ``save_ckpt``; pretrained/download.sh fetches
``hierarchical_ordered{,_fonts}.pth.tar``). This module maps that state_dict
onto this framework's flax parameter tree so existing checkpoints keep
working — numerical forward parity is verified in
tests/test_torch_parity.py, which routes its weight transplant through
:func:`state_dict_to_params`.

Supported: transformer models, one/two encode/decode stages, one-shot and
autoregressive decoders, VAE or linear bottleneck, label conditioning, and
the LSTM variants (reference model/model.py:111 bidirectional encoder,
:231-241 decoder + fc_hc initial state; no published checkpoints exist for
them, but user-trained ones load).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .config import ModelConfig


def _strip_module_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop the ``nn.DataParallel`` wrapper prefix (reference
    train_utils.py:155 unwraps ``.module`` before saving, but user-saved
    checkpoints may still carry it)."""
    if sd and all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def state_dict_to_params(sd: Dict[str, np.ndarray], cfg: ModelConfig) -> dict:
    """Torch ``state_dict`` (numpy values) -> flax params tree for
    ``SVGTransformer(cfg)``. Linear weights transpose (torch stores
    ``[out, in]``); LayerNorms stack to the fused kernels' ``[2, D]``
    (scale, bias) layout."""
    sd = _strip_module_prefix(sd)

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def ln_stacked(prefix):
        return np.stack([sd[f"{prefix}.weight"], sd[f"{prefix}.bias"]])

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}

    def enc_layer(prefix):
        p = {
            "wqkv": sd[f"{prefix}.self_attn.in_proj_weight"].T,
            "bqkv": sd[f"{prefix}.self_attn.in_proj_bias"],
            "wo": sd[f"{prefix}.self_attn.out_proj.weight"].T,
            "bo": sd[f"{prefix}.self_attn.out_proj.bias"],
            "norm1": ln_stacked(f"{prefix}.norm1"),
            "norm2": ln_stacked(f"{prefix}.norm2"),
            "ff1_kernel": sd[f"{prefix}.linear1.weight"].T,
            "ff1_bias": sd[f"{prefix}.linear1.bias"],
            "ff2_kernel": sd[f"{prefix}.linear2.weight"].T,
            "ff2_bias": sd[f"{prefix}.linear2.bias"],
        }
        if f"{prefix}.linear_global2.weight" in sd:  # label conditioning
            p["glob2_kernel"] = sd[f"{prefix}.linear_global2.weight"].T
            p["glob2_bias"] = sd[f"{prefix}.linear_global2.bias"]
        return p

    def dec_layer(prefix):
        p = enc_layer(prefix)
        p["glob_kernel"] = sd[f"{prefix}.linear_global.weight"].T
        p["glob_bias"] = sd[f"{prefix}.linear_global.bias"]
        return p

    def stack(prefix, n, layer_fn):
        out = {f"layer_{i}": layer_fn(f"{prefix}.layers.{i}") for i in range(n)}
        out["norm"] = ln(f"{prefix}.norm")
        return out

    def svg_embedding(prefix):
        p = {
            "command_embed": sd[f"{prefix}.command_embed.weight"],
            "arg_embed": sd[f"{prefix}.arg_embed.weight"],
            "embed_fcn_kernel": sd[f"{prefix}.embed_fcn.weight"].T,
            "embed_fcn_bias": sd[f"{prefix}.embed_fcn.bias"],
            "pos_embed": sd[f"{prefix}.pos_encoding.pos_embed.weight"],
        }
        if f"{prefix}.group_embed.weight" in sd:
            p["group_embed"] = sd[f"{prefix}.group_embed.weight"]
        return p

    def const_embedding(prefix):
        return {"PE": {"pos_embed": sd[f"{prefix}.PE.pos_embed.weight"]}}

    def label_embedding(prefix):
        return {"label_embedding": {
            "embedding": sd[f"{prefix}.label_embedding.weight"]
        }}

    def lstm_cell(prefix, suffix=""):
        """One torch ``nn.LSTM`` direction -> flax OptimizedLSTMCell params.
        Torch packs gates row-wise as (i, f, g, o) in ``weight_ih/weight_hh``
        ``[4H, *]`` with TWO bias vectors; flax keeps per-gate Dense pairs
        ``i{g}`` (no bias) / ``h{g}`` (bias) with identical gate equations,
        so the hidden-side bias absorbs ``bias_ih + bias_hh``."""
        wih = sd[f"{prefix}.weight_ih_l0{suffix}"]
        whh = sd[f"{prefix}.weight_hh_l0{suffix}"]
        bias = sd[f"{prefix}.bias_ih_l0{suffix}"] + sd[f"{prefix}.bias_hh_l0{suffix}"]
        h = whh.shape[1]
        cell = {}
        for gi, g in enumerate(("i", "f", "g", "o")):
            rows = slice(gi * h, (gi + 1) * h)
            cell[f"i{g}"] = {"kernel": wih[rows].T}
            cell[f"h{g}"] = {"kernel": whh[rows].T, "bias": bias[rows]}
        return cell

    params: dict = {}

    # --- encoder ---------------------------------------------------------
    if cfg.model_type == "lstm":
        # flax nn.RNN is a transform, not a scope: the cells sit directly
        # under the LSTMEncoder as OptimizedLSTMCell_{0,1} (fwd, bwd)
        enc_stack = {
            "OptimizedLSTMCell_0": lstm_cell("encoder.encoder"),
            "OptimizedLSTMCell_1": lstm_cell("encoder.encoder", "_reverse"),
        }
    else:
        enc_stack = stack("encoder.encoder", cfg.n_layers, enc_layer)
    enc = {"embedding": svg_embedding("encoder.embedding"),
           "encoder": enc_stack}
    if cfg.encode_stages == 2:
        if "encoder.hierarchical_PE.pos_embed.weight" in sd:
            enc["hierarchical_PE"] = {
                "pos_embed": sd["encoder.hierarchical_PE.pos_embed.weight"]
            }
        enc["hierarchical_encoder"] = stack(
            "encoder.hierarchical_encoder", cfg.n_layers, enc_layer
        )
    if cfg.label_condition and "encoder.label_embedding.label_embedding.weight" in sd:
        enc["label_embedding"] = label_embedding("encoder.label_embedding")
    params["encoder"] = enc

    # --- bottleneck ------------------------------------------------------
    if cfg.use_resnet:
        params["resnet"] = {
            f"linear{i}": dense(f"resnet.linear{i}.0") for i in range(1, 5)
        }
    if cfg.use_vae:
        params["vae"] = {"enc_mu_fcn": dense("vae.enc_mu_fcn"),
                         "enc_sigma_fcn": dense("vae.enc_sigma_fcn")}
    else:
        params["bottleneck"] = {"bottleneck": dense("bottleneck.bottleneck")}

    # --- decoder ---------------------------------------------------------
    dec: dict = {}
    if cfg.decode_stages == 2:
        dec["hierarchical_embedding"] = const_embedding("decoder.hierarchical_embedding")
        dec["hierarchical_decoder"] = stack(
            "decoder.hierarchical_decoder", cfg.n_layers_decode, dec_layer
        )
        dec["hierarchical_fcn"] = {
            "visibility_fcn": dense("decoder.hierarchical_fcn.visibility_fcn"),
            "z_fcn": dense("decoder.hierarchical_fcn.z_fcn"),
        }
    if cfg.pred_mode == "autoregressive":
        dec["embedding"] = svg_embedding("decoder.embedding")
    else:
        dec["embedding"] = const_embedding("decoder.embedding")
    if cfg.model_type == "lstm":
        dec["decoder"] = {"fc_hc": dense("decoder.fc_hc"),
                          "OptimizedLSTMCell_0": lstm_cell("decoder.decoder")}
    else:
        dec["decoder"] = stack("decoder.decoder", cfg.n_layers_decode, dec_layer)
    dec["fcn"] = {
        "command_kernel": sd["decoder.fcn.command_fcn.weight"].T,
        "command_bias": sd["decoder.fcn.command_fcn.bias"],
        "args_kernel": sd["decoder.fcn.args_fcn.weight"].T,
        "args_bias": sd["decoder.fcn.args_fcn.bias"],
    }
    if cfg.label_condition and "decoder.label_embedding.label_embedding.weight" in sd:
        dec["label_embedding"] = label_embedding("decoder.label_embedding")
    params["decoder"] = dec

    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), params)


def load_torch_checkpoint(path: str, cfg: ModelConfig):
    """Load a reference ``.pth.tar`` checkpoint (or bare state_dict file) and
    return the flax params for ``SVGTransformer(cfg)``. Requires torch (CPU)
    for unpickling only."""
    import torch

    try:
        state = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state.get("model", state) if isinstance(state, dict) else state
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    return state_dict_to_params(sd, cfg)
