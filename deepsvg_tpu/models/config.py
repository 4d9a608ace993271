"""Model hyperparameter config + named architecture variants.

Frozen-dataclass mirror of the reference's mutable config class
(deepsvg/model/config.py:4-108), including ``model_args`` — the contract
describing which dataset tensors feed the model.
"""
from __future__ import annotations

import dataclasses
from typing import Literal

from ..svgtensor.constants import ARGS_DIM, N_ARGS, N_COMMANDS


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Hyperparameters of the SVG Transformer family (reference defaults:
    model/config.py:9-45)."""

    args_dim: int = ARGS_DIM          # coordinate quantization (8-bit grid)
    n_args: int = N_ARGS              # rx,ry,phi,fA,fS,qx1,qy1,qx2,qy2,x,y
    n_commands: int = N_COMMANDS      # m,l,c,a,EOS,SOS,z

    dropout: float = 0.1

    model_type: Literal["transformer", "lstm"] = "transformer"

    encode_stages: int = 1            # 0 (decode-only), 1, or 2
    decode_stages: int = 1            # 1 or 2

    use_resnet: bool = True           # residual FC stack after the encoder
    use_vae: bool = True              # reparametrized Gaussian vs linear bottleneck

    pred_mode: Literal["one_shot", "autoregressive"] = "one_shot"
    rel_targets: bool = False         # relative (delta) coordinate targets

    label_condition: bool = False
    n_labels: int = 100
    dim_label: int = 64

    self_match: bool = False          # Hungarian assignment of predicted groups

    n_layers: int = 4
    n_layers_decode: int = 4
    n_heads: int = 8
    dim_feedforward: int = 512
    d_model: int = 256

    dim_z: int = 256

    max_num_groups: int = 8           # N_P: number of paths
    max_seq_len: int = 30             # N_C: commands per path
    num_groups_proposal: int | None = None  # defaults to max_num_groups

    # numerics: activations/attention in this dtype (params stay float32)
    compute_dtype: str = "float32"

    # attention backend: "xla" (plain jnp lowering) or "pallas" (fused VMEM
    # kernels on BOTH paths: whole-layer inference kernels and whole-layer
    # custom-VJP training kernels with in-kernel dropout; interpret-mode on
    # CPU). See ops/layer.py, ops/layer_vjp.py.
    attention_impl: str = "xla"
    # backend override for the HIERARCHICAL (stage-2) stacks, whose
    # sequences are G=8-token-tiny (per-layer FLOPs ~1/30 of the big
    # stages'). A/B'd on-chip (scripts/exp_hier_stack_impl.py): the fused
    # Pallas kernels still WIN there — full flagship train step 25.1 ms
    # (pallas) vs 26.2 ms (stage-2 on xla) — so the default (None = follow
    # attention_impl) is correct; the knob remains for experiments.
    attention_impl_hierarchical: str | None = None

    @property
    def attn_impl_hier(self) -> str:
        return self.attention_impl_hierarchical or self.attention_impl

    @property
    def max_total_len(self) -> int:
        return self.max_num_groups * self.max_seq_len

    @property
    def n_groups_prop(self) -> int:
        return self.num_groups_proposal or self.max_num_groups

    @property
    def args_dim_out(self) -> int:
        """Size of the argument classification head: one class per quantized
        value plus PAD (absolute mode) or the full delta range (relative)."""
        return 2 * self.args_dim if self.rel_targets else self.args_dim + 1

    def get_model_args(self) -> list[str]:
        """Which dataset keys feed (encoder, decoder) — reference
        model/config.py:47-60."""
        model_args = []
        model_args += (
            ["commands_grouped", "args_grouped"]
            if self.encode_stages <= 1
            else ["commands", "args"]
        )
        if self.rel_targets:
            model_args += (
                ["commands_grouped", "args_rel_grouped"]
                if self.decode_stages == 1
                else ["commands", "args_rel"]
            )
        else:
            model_args += (
                ["commands_grouped", "args_grouped"]
                if self.decode_stages == 1
                else ["commands", "args"]
            )
        if self.label_condition:
            model_args.append("label")
        return model_args


# Named variants (reference model/config.py:63-108). The reference's LSTM
# variants keep model_type="lstm" (a causally-masked transformer is NOT a
# substitute) — the LSTM cells live in models/model.py for parity.

def sketchrnn() -> ModelConfig:
    return ModelConfig(model_type="lstm", pred_mode="autoregressive", rel_targets=True)


def sketchformer() -> ModelConfig:
    return ModelConfig(pred_mode="autoregressive", rel_targets=True)


def one_stage_one_shot() -> ModelConfig:
    return ModelConfig(encode_stages=1, decode_stages=1)


def hierarchical() -> ModelConfig:
    return ModelConfig(encode_stages=2, decode_stages=2)


def hierarchical_self_matching() -> ModelConfig:
    return ModelConfig(encode_stages=2, decode_stages=2, self_match=True)


def tpu_fast(cfg: ModelConfig) -> ModelConfig:
    """The fast execution profile when running on real TPU hardware: bf16
    compute + the fused Pallas kernel paths (inference layers, training
    layer VJPs, embeddings, heads — measured 5.7x the stock f32 training
    lowering and 4.9x inference, docs/PERFORMANCE.md). On any other backend
    the config is returned unchanged (the Pallas kernels run interpret-mode
    on CPU: correct but slow — only worth it on chips)."""
    import dataclasses

    import jax

    if jax.default_backend() != "tpu":
        return cfg
    return dataclasses.replace(
        cfg, attention_impl="pallas", compute_dtype="bfloat16"
    )
