"""SVG Transformer model family (flax.linen)."""
from .config import (
    ModelConfig,
    hierarchical,
    hierarchical_self_matching,
    one_stage_one_shot,
    sketchformer,
    sketchrnn,
)
from .loss import svg_loss
from .model import SVGTransformer
from .sample import (
    autoregressive_sample,
    autoregressive_sample_cached,
    flatten_groups_np,
    greedy_sample,
    one_shot_sample,
)
from .torch_import import load_torch_checkpoint, state_dict_to_params

__all__ = [
    "ModelConfig", "SVGTransformer", "svg_loss",
    "hierarchical", "hierarchical_self_matching", "one_stage_one_shot",
    "sketchformer", "sketchrnn",
    "autoregressive_sample", "autoregressive_sample_cached",
    "flatten_groups_np", "greedy_sample",
    "one_shot_sample",
    "load_torch_checkpoint", "state_dict_to_params",
]
