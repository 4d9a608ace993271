"""Analytic model-FLOPs accounting for MFU reporting.

Counts matmul MACs only (the standard MFU convention — elementwise/softmax
work is not counted), 2 FLOPs per MAC. Gathers (embedding lookups, positional
LUTs) are bandwidth, not FLOPs, and are excluded.

Reference architecture being counted: SVGTransformer
(models/model.py; reference deepsvg/model/model.py:288-479):
E1 per-group encoder -> E2 group encoder -> ResNet -> bottleneck ->
D2 group decoder (+ HierarchFCN) -> D1 per-group decoder -> FCN heads.
"""
from __future__ import annotations

from ..models.config import ModelConfig


def _layer_macs(tokens: int, attn_len: int, d: int, dff: int,
                dz_inject: int = 0, label_inject: int = 0) -> int:
    """MACs of one transformer layer over ``tokens`` positions attending over
    ``attn_len`` keys: QKV+out projections (4d^2), score+value matmuls
    (2*attn_len*d), feed-forward (2*d*dff), plus the per-layer latent /
    label linear injections of the 'improved' blocks."""
    per_token = 4 * d * d + 2 * attn_len * d + 2 * d * dff
    per_token += dz_inject * d + label_inject * d
    return tokens * per_token


def flops_per_sample(cfg: ModelConfig, decode: bool = True,
                     encode: bool = True) -> int:
    """Forward-pass FLOPs for ONE sample of the (two-stage, one-shot)
    model at the config's sequence budget. For training steps multiply by 3
    (forward + ~2x backward)."""
    d, dff, dz = cfg.d_model, cfg.dim_feedforward, cfg.dim_z
    G, S = cfg.max_num_groups, cfg.max_seq_len
    lab = cfg.dim_label if cfg.label_condition else 0
    n_arg_embed = cfg.n_args * 64  # SVGEmbedding arg projection input width

    macs = 0
    if encode:
        if cfg.encode_stages == 2:
            s1 = S + 2                       # per-group sequence incl SOS/EOS
            t1 = G * s1
            macs += t1 * n_arg_embed * d     # embedding FCN
            macs += cfg.n_layers * _layer_macs(t1, s1, d, dff, label_inject=lab)
            macs += cfg.n_layers * _layer_macs(G, G, d, dff, label_inject=lab)
        else:
            s1 = cfg.max_total_len + 2
            macs += s1 * n_arg_embed * d
            macs += cfg.n_layers * _layer_macs(s1, s1, d, dff, label_inject=lab)
        if cfg.use_resnet:
            macs += 4 * d * d
        macs += d * dz * (2 if cfg.use_vae else 1)   # vae mu+sigma / bottleneck

    if decode:
        P = cfg.n_groups_prop
        if cfg.decode_stages == 2:
            macs += cfg.n_layers_decode * _layer_macs(
                P, P, d, dff, dz_inject=dz, label_inject=lab)
            macs += P * (d * 2 + d * dz)             # HierarchFCN heads
            s_out = S + 1
            t_out = P * s_out
            macs += cfg.n_layers_decode * _layer_macs(
                t_out, s_out, d, dff, dz_inject=dz, label_inject=lab)
        else:
            s_out = cfg.max_total_len + 1
            t_out = s_out
            macs += cfg.n_layers_decode * _layer_macs(
                t_out, s_out, d, dff, dz_inject=dz, label_inject=lab)
        # FCN heads: command + argument classification
        macs += t_out * d * cfg.n_commands
        macs += t_out * d * (cfg.n_args * cfg.args_dim_out)

    return 2 * macs


# bf16 peak FLOPs/s per chip by device kind (public spec sheets)
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v6 lite": 918e12,   # v6e / Trillium
}


def peak_flops_per_chip(device_kind: str) -> float | None:
    """Best-effort peak bf16 FLOPs/s lookup for ``device.device_kind``."""
    for k, v in sorted(_PEAK_BF16.items(), key=lambda kv: -len(kv[0])):
        if device_kind.startswith(k):
            return v
    return None
