"""TPU kernels (Pallas): fused attention (fwd + custom-VJP bwd), fused
embedding lookups, fused head+argmax; block-packed XLA attention."""
from .attention import fused_mha, mha_blockpacked, mha_reference, pick_tile_b
from .attention_vjp import fused_mha_train
from .embedding import fold_arg_tables, fused_embedding
from .head import fused_head_argmax
from .layer import fused_decoder_layer, fused_encoder_layer

__all__ = [
    "fused_mha", "fused_mha_train", "mha_blockpacked", "mha_reference",
    "pick_tile_b", "fold_arg_tables", "fused_embedding", "fused_head_argmax",
    "fused_decoder_layer", "fused_encoder_layer",
]
