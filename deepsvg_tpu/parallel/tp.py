"""Tensor-parallel training over a 2-D (data x model) mesh via GSPMD.

The DP path (``parallel/mesh.py``) uses ``shard_map`` because the fused
Pallas kernels are custom calls XLA's SPMD partitioner cannot split. This
module is the complementary MODEL-parallel path for models whose layers
outgrow one chip: Megatron-style PartitionSpecs on the transformer weights
(column-parallel QKV/FF-in, row-parallel out-proj/FF-out), activations
sharded on batch over ``data`` — and XLA's GSPMD partitioner inserts the
all-reduces over ICI. No collective is written by hand, per the
scaling-book recipe: pick a mesh, annotate shardings, let XLA do the rest.

Runs the plain-XLA attention path (``attention_impl="xla"``): under GSPMD
the partitioner must see through every op, which custom calls prevent —
exactly why TP lives here and not in the shard_map DP step. At this
framework's flagship scale (~10M params) TP is never NEEDED; the path is
validated on the virtual 8-device CPU mesh (2 data x 4 model) so the
framework carries a working recipe for bigger-than-chip variants.

Sharding rules are matched against the *tree path suffix*, so one rule set
covers ``state.params`` AND the AdamW moments (``mu``/``nu`` mirror the
param tree paths). Scalars and unmatched leaves replicate.
"""
from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Megatron-style layer split (models/layers.py param names):
#   wqkv (d, 3d)  column-parallel -> heads land shard-local
#   wo   (d, d)   row-parallel    -> all-reduce after the out-projection
#   ff1  (d, dff) column-parallel; ff2 (dff, d) row-parallel
# Biases follow their kernel's OUTPUT sharding (row-parallel outputs are
# formed by the all-reduce, so their biases replicate).
TP_RULES = (
    ("wqkv", P(None, "model")),
    ("bqkv", P("model")),
    ("ff1_kernel", P(None, "model")),
    ("ff1_bias", P("model")),
    ("ff2_kernel", P("model", None)),
    ("wo", P("model", None)),
)


def _spec_for(path: str, leaf) -> P:
    ndim = getattr(leaf, "ndim", 0)
    for name, spec in TP_RULES:
        if f"'{name}'" in path and ndim == len(spec):
            return spec
    return P()


def state_tp_shardings(state, mesh: Mesh):
    """NamedSharding tree for a TrainState (params + optimizer moments
    share path suffixes, so the one rule set shards both)."""

    def f(path, leaf):
        return NamedSharding(mesh, _spec_for(jax.tree_util.keystr(path), leaf))

    return jax.tree_util.tree_map_with_path(f, state)


def shard_state_tp(state, mesh: Mesh):
    """Place a (host or single-device) TrainState onto the 2-D mesh."""
    return jax.device_put(state, state_tp_shardings(state, mesh))


def make_tp_train_step(model, optimizer, model_args, mesh: Mesh, state,
                       data_axis: str = "data", donate: bool = True):
    """Jit the standard train step with GSPMD in/out shardings derived from
    ``state`` (batch: dim 0 over ``data``; weights: replicated). The step
    body is the exact single-device ``trainer.train_step`` — global-batch
    semantics, no named-axis psum: the partitioner derives every collective
    from the sharding annotations."""
    assert model.cfg.attention_impl != "pallas", (
        "TP partitions through plain XLA ops; Pallas custom calls cannot be "
        "split by GSPMD — build the model with attention_impl='xla' "
        "(the Pallas kernels remain the single-chip/DP fast path)")
    from ..training.trainer import train_step

    fn = partial(train_step, model=model, optimizer=optimizer,
                 model_args=model_args, axis_name=None)
    st_sh = state_tp_shardings(state, mesh)
    batch_sh = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        fn,
        in_shardings=(st_sh, batch_sh, repl),
        out_shardings=(st_sh, repl),
        donate_argnums=(0,) if donate else (),
    )
