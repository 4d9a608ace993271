"""Core SVG tensor data contract (constants, masks, packing, rel/abs transforms)."""
from .constants import (
    ARGS_DIM,
    CMD_A,
    CMD_ARGS_MASK_NP,
    CMD_C,
    CMD_EOS,
    CMD_L,
    CMD_M,
    CMD_SOS,
    CMD_Z,
    COMMANDS_SIMPLIFIED,
    Index,
    IndexArgs,
    N_ARGS,
    N_COMMANDS,
    PAD_VAL,
)
from .masks import (
    causal_mask,
    group_mask,
    key_padding_mask,
    key_visibility_mask,
    padding_mask,
    sequence_lengths,
    visibility_mask,
)
from .wrapper import SVGTensor
from .tensor import (
    cmd_args_to_data14,
    data14_to_cmd_args,
    make_absolute,
    mask_invalid_args,
    pack_groups,
    pack_sequence,
    relative_args,
)

__all__ = [
    "ARGS_DIM", "CMD_A", "CMD_ARGS_MASK_NP", "CMD_C", "CMD_EOS", "CMD_L",
    "CMD_M", "CMD_SOS", "CMD_Z", "COMMANDS_SIMPLIFIED", "Index", "IndexArgs",
    "N_ARGS", "N_COMMANDS", "PAD_VAL",
    "causal_mask", "group_mask", "key_padding_mask", "key_visibility_mask",
    "padding_mask", "sequence_lengths", "visibility_mask",
    "SVGTensor",
    "cmd_args_to_data14", "data14_to_cmd_args", "make_absolute",
    "mask_invalid_args", "pack_groups", "pack_sequence", "relative_args",
]
