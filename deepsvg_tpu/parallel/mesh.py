"""Device mesh + sharding for data-parallel (and future model-parallel) runs.

The reference's only parallelism is single-process ``nn.DataParallel``
(train.py:74) — replicate/scatter/gather over local GPUs. The TPU-native
equivalent is a ``jax.sharding.Mesh`` with the batch axis sharded over the
``data`` axis: gradients all-reduce over ICI automatically inside the jitted
step (SURVEY.md §2 parallelism inventory). A ``model`` axis is exposed for
future tensor parallelism, but the ~10M-param model needs none.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    data_axis: str = "data",
    model_axis: Optional[str] = None,
    n_model: int = 1,
) -> Mesh:
    """A 1-D (data) or 2-D (data x model) mesh over the available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if model_axis is None:
        return Mesh(np.asarray(devices), (data_axis,))
    assert n % n_model == 0
    grid = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(grid, (data_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data",
                   batch_dim: int = 0) -> NamedSharding:
    """Shard the batch axis (``batch_dim``) over the data axis; everything
    else replicated. ``batch_dim=1`` serves step-stacked ``[K, B, ...]``
    batches (multi-step dispatch)."""
    return NamedSharding(mesh, P(*([None] * batch_dim), data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, data_axis: str = "data",
                batch_dim: int = 0) -> dict:
    """Place a host batch dict onto the mesh, batch-axis sharded."""
    sharding = batch_sharding(mesh, data_axis, batch_dim)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def global_batch_from_local(batch: dict, mesh: Mesh, data_axis: str = "data") -> dict:
    """Multi-host (DCN) input pipeline: each process contributes its local
    shard of the global batch (``jax.make_array_from_process_local_data``).

    On a single host this degrades to :func:`shard_batch`. Per-host loaders
    should feed disjoint index ranges (e.g. ``indices[process_index::count]``).
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh, data_axis)
    sharding = batch_sharding(mesh, data_axis)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def make_parallel_train_step(model, optimizer, model_args, mesh: Mesh,
                             data_axis: str = "data"):
    """Data-parallel train step: ``shard_map`` over the ``data`` axis — each
    shard computes its local forward/backward, the loss reduces globally
    (psum'd masked means, exact single-device semantics), gradients psum over
    ICI, and every shard applies the identical optimizer update.

    shard_map (not pjit sharding constraints) is deliberate: the Pallas
    kernels (fused layers/CE/heads) are custom calls that XLA's SPMD
    partitioner cannot split — under shard_map each shard invokes them on its
    local block, which is exactly the batch-grid tiling they are written for.
    """
    from functools import partial

    from ..training.trainer import train_step

    fn = partial(train_step, model=model, optimizer=optimizer,
                 model_args=model_args, axis_name=data_axis)
    sm = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(data_axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sm, donate_argnums=(0,))


def make_parallel_multi_step(model, optimizer, model_args, mesh: Mesh,
                             weights_fn, data_axis: str = "data"):
    """K data-parallel train steps per dispatch: ``lax.scan`` over a
    ``[K, B, ...]`` stacked batch dict, each step a shard_map'd DP step (see
    :func:`make_parallel_train_step`), loss weights computed in-graph from
    the step counter (see trainer.jit_train_multi_step). Batches must be
    sharded with ``batch_dim=1`` (``shard_batch(..., batch_dim=1)``)."""
    import jax.numpy as jnp

    from functools import partial

    from ..training.trainer import train_step

    fn = partial(train_step, model=model, optimizer=optimizer,
                 model_args=model_args, axis_name=data_axis)

    def one(state, batch, weights):
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(), P(data_axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(state, batch, weights)

    def multi(state, batches):
        def body(st, batch):
            st, res = one(st, batch, weights_fn(st.step))
            return st, {k: v for k, v in res.items() if jnp.ndim(v) == 0}

        return jax.lax.scan(body, state, batches)

    return jax.jit(multi, donate_argnums=(0,))


def make_parallel_resident_multi_step(model, optimizer, model_args,
                                      mesh: Mesh, weights_fn,
                                      n_augs: int = 1,
                                      data_axis: str = "data",
                                      item_shapes: dict | None = None):
    """Data-parallel device-resident training (data/resident.py × DP): the
    wire-compressed dataset is REPLICATED on every chip (a few GB — well
    inside a chip's HBM next to the ~10M-param model), each shard gathers
    its ``B/n`` rows of every step's batch from its local copy, and K steps
    scan per dispatch. Only the ``[K, B]`` icon indices cross the host
    boundary, sharded over ``data`` on their batch axis — the steady state
    needs no host bandwidth at all, on ANY number of chips. Augmentation
    choice is drawn on device per (step, shard, item). ``item_shapes``:
    rows arrive FLATTENED ``[M, prod(shape)]`` and reshape after the gather
    (the lane-padding repack otherwise costs a corpus-sized temp — see
    trainer.jit_train_resident_multi_step)."""
    import jax.numpy as jnp

    from functools import partial

    from ..training.trainer import train_step

    fn = partial(train_step, model=model, optimizer=optimizer,
                 model_args=model_args, axis_name=data_axis)

    def shard_fn(st, data, idx, w):
        if n_augs > 1:
            akey = jax.random.fold_in(jax.random.PRNGKey(0xA9), st.step)
            akey = jax.random.fold_in(akey, jax.lax.axis_index(data_axis))
            aug = jax.random.randint(akey, idx.shape, 0, n_augs)
            flat = idx * n_augs + aug
        else:
            flat = idx
        batch = {k: jnp.take(v, flat, axis=0) for k, v in data.items()}
        if item_shapes:
            batch = {k: v.reshape(v.shape[:1] + tuple(item_shapes[k]))
                     for k, v in batch.items()}
        return fn(st, batch, w)

    def one(state, data, idx, weights):
        return jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(data_axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(state, data, idx, weights)

    def multi(state, data, idxs):
        def body(st, idx):
            st, res = one(st, data, idx, weights_fn(st.step))
            return st, {k: v for k, v in res.items() if jnp.ndim(v) == 0}

        return jax.lax.scan(body, state, idxs)

    return jax.jit(multi, donate_argnums=(0,))
