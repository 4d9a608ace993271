"""Core constants of the SVG tensor representation.

This is the shared data contract between the SVG library, the differentiable ops,
the datasets and the model (reference semantics: deepsvg/difflib/tensor.py:8-51,
deepsvg/model/config.py:9-11).

Layout
------
A tensorized SVG command is one row of 14 columns::

    col 0      : command index (see COMMANDS_SIMPLIFIED)
    cols 1-2   : radius (rx, ry)              [arc only]
    col 3      : x_axis_rotation              [arc only]
    col 4      : large_arc_flag               [arc only]
    col 5      : sweep_flag                   [arc only]
    cols 6-7   : start position (x, y)        (redundant; derived from prev end)
    cols 8-9   : control1 (x, y)              [cubic only]
    cols 10-11 : control2 (x, y)              [cubic only]
    cols 12-13 : end position (x, y)

The model consumes the 11-column *argument* layout, which drops the command id and
the redundant start position::

    cols 0-1 : radius,  col 2: x_axis_rot, col 3: large_arc_flg, col 4: sweep_flg,
    cols 5-6 : control1, cols 7-8: control2, cols 9-10: end_pos

Unused arguments carry ``PAD_VAL`` (-1); coordinates are numericalized to
``[0, ARGS_DIM)`` (8-bit grid by default).
"""
from __future__ import annotations

import numpy as np

# Command vocabulary (index = class id used by the model).
COMMANDS_SIMPLIFIED = ("m", "l", "c", "a", "EOS", "SOS", "z")

CMD_M, CMD_L, CMD_C, CMD_A, CMD_EOS, CMD_SOS, CMD_Z = range(7)
N_COMMANDS = len(COMMANDS_SIMPLIFIED)

N_ARGS = 11          # 11-column argument layout
ARGS_DIM = 256       # coordinate quantization grid (8-bit)
PAD_VAL = -1         # pad value for unused / padded arguments

# Which of the 11 args each command uses (reference: difflib/tensor.py:15-21).
#                           rx ry rot fA fS c1x c1y c2x c2y  x  y
CMD_ARGS_MASK_NP = np.array(
    [
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1],  # m
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1],  # l
        [0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1],  # c
        [1, 1, 1, 1, 1, 0, 0, 0, 0, 1, 1],  # a
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],  # EOS
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],  # SOS
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],  # z
    ],
    dtype=np.float32,
)


class Index:
    """Column layout of the 14-col row format (reference: difflib/tensor.py:23-32)."""

    COMMAND = 0
    RADIUS = slice(1, 3)
    X_AXIS_ROT = 3
    LARGE_ARC_FLG = 4
    SWEEP_FLG = 5
    START_POS = slice(6, 8)
    CONTROL1 = slice(8, 10)
    CONTROL2 = slice(10, 12)
    END_POS = slice(12, 14)


class IndexArgs:
    """Column layout of the 11-col args format (reference: difflib/tensor.py:34-41)."""

    RADIUS = slice(0, 2)
    X_AXIS_ROT = 2
    LARGE_ARC_FLG = 3
    SWEEP_FLG = 4
    CONTROL1 = slice(5, 7)
    CONTROL2 = slice(7, 9)
    END_POS = slice(9, 11)
