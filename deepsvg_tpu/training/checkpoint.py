"""Checkpoint save/resume (reference: deepsvg/utils/train_utils.py:10-156).

Same semantics as the reference — ``{step:06d}`` directories with model +
optimizer + stats + config, unconditional "best" copy, latest-step restore,
weights-only load for inference — implemented on orbax-style msgpack
serialization of flax pytrees (preemption-safe atomic writes).
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import warnings
from typing import Optional, Tuple

import numpy as np
from flax import serialization


def _ckpt_path(checkpoint_dir: str, step: int) -> str:
    return os.path.join(checkpoint_dir, f"{step:06d}.ckpt")


# device_snapshot: jitted per-dtype leaf packers, keyed by the pytree's
# (treedef, shapes/dtypes) signature — one compile per train-state structure
_PACKER_CACHE: dict = {}

# fetch granularity for packed snapshots: ONE monolithic per-dtype fetch
# (~124 MB of train state) monopolizes the remote-relay channel for seconds
# and every concurrently-dispatched train step queues behind it (measured
# ~5-6 s dispatch stalls per save, r5 stamped B=60 segment). Chunked
# outputs keep each fetch RPC short so step dispatches interleave.
_SNAP_CHUNK_BYTES = 8 * 1024 * 1024


def _snapshot_dispatch(tree):
    """Phase 1 of :func:`device_snapshot`: dispatch the on-device packing
    program and return a context for :func:`_snapshot_finish`, or ``None``
    for host-only trees. Non-blocking past the jit dispatch, so a caller may
    hand the context to a background thread and keep training — the packed
    outputs are FRESH buffers, safe to hold across donated train steps
    (``leaves`` is only consulted for host values and shape/dtype metadata
    afterwards, never for device buffer contents)."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    dev_idx = [i for i, l in enumerate(leaves) if isinstance(l, jax.Array)]
    if not dev_idx:
        return None

    # key includes WHICH positions are device leaves: two trees with the same
    # treedef and device-leaf signature but a different device/host split must
    # not share a packer (some jax.Array leaves would silently bypass the
    # batched snapshot)
    sig = (treedef, tuple(dev_idx),
           tuple((leaves[i].shape, str(leaves[i].dtype)) for i in dev_idx))
    cached = _PACKER_CACHE.get(sig)
    if cached is None:
        groups: dict = {}
        for i in dev_idx:
            groups.setdefault(str(leaves[i].dtype), []).append(i)

        def pack(dev_leaves, _groups=groups):
            out = {}
            for dt, idxs in _groups.items():
                buf = jnp.concatenate(
                    [dev_leaves[i].reshape(-1) for i in idxs])
                c = max(1, _SNAP_CHUNK_BYTES // buf.dtype.itemsize)
                out[dt] = [buf[o:o + c]
                           for o in range(0, buf.shape[0], c)]
            return out

        cached = (jax.jit(pack), groups)
        _PACKER_CACHE[sig] = cached
    packer, groups = cached
    return packer(leaves), groups, leaves, treedef


def _snapshot_finish(ctx):
    """Phase 2: fetch the packed buffers (one transfer per dtype) and split
    back into the original leaf layout."""
    import jax

    packed, groups, leaves, treedef = ctx
    # one transfer per CHUNK, sequentially: short RPCs let the training
    # loop's step dispatches interleave on the relay channel (the write-
    # behind worker calls this; a monolithic fetch stalled dispatch ~5-6 s)
    host = {dt: np.concatenate([np.asarray(jax.device_get(ch))
                                for ch in chunks])
            for dt, chunks in packed.items()}
    out = list(leaves)
    for dt, idxs in groups.items():
        buf, off = host[dt], 0
        for i in idxs:
            n = int(np.prod(leaves[i].shape, dtype=np.int64))
            out[i] = buf[off:off + n].reshape(leaves[i].shape)
            off += n
    return treedef.unflatten(out)


def device_snapshot(tree):
    """Fetch a jax pytree to host numpy in O(dtypes) device->host transfers
    instead of O(leaves).

    ``flax.serialization.to_bytes`` converts leaves one at a time; through a
    remote-TPU relay each conversion is a full RPC round trip (~74 ms — see
    docs/NOTES.md), so a ~300-leaf train state costs ~25 s per checkpoint
    (measured, r4 full run). Instead: jit-concatenate the raveled leaves into
    ONE contiguous device buffer per dtype, fetch each buffer with a single
    transfer, and split host-side. Same bytes, ~2-4 RPCs.

    Non-jax leaves (python ints, numpy arrays) pass through unchanged, so the
    function is a no-op on host-only pytrees (CPU tests, already-fetched
    states).
    """
    ctx = _snapshot_dispatch(tree)
    return tree if ctx is None else _snapshot_finish(ctx)


def _jsonable(v):
    """JSON fallback for train_vars content (the reference pickles train_vars
    wholesale via torch.save; here arbitrary arrays degrade to nested lists —
    the visualize hooks re-``np.asarray`` their inputs, so a restored run
    behaves identically)."""
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, np.generic):
        return v.item()
    # json.dumps only calls this for non-serializable values, so anything
    # reaching here round-trips as a string (the restored value changes
    # type); make that detectable instead of silent
    warnings.warn(
        f"train_vars value of type {type(v).__name__} is checkpointed as "
        f"repr() and will restore as a str", stacklevel=3)
    return repr(v)


# v2 on-disk format: msgpack (flax to_bytes) re-copies every leaf and
# np.savez CRCs/zips the whole payload — together ~4.3 s of host time per
# ~125 MB train state on this 1-core host (measured), x833 saves in the
# 50-epoch recipe. v2 writes raw leaf bytes + a JSON manifest instead
# (~0.4 s). load_ckpt sniffs the magic and still reads v1 (npz) files.
_CKPT_MAGIC = b"DSVGCKPT2\n"


def _np_dtype(name: str):
    try:
        return np.dtype(name)
    except TypeError:  # bfloat16 et al. live in ml_dtypes
        import ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


def _write_ckpt_v2(f, state_np, meta_bytes: bytes):
    import jax

    # NOT ascontiguousarray: it implies ndmin=1 and silently promotes 0-d
    # leaves (state.step!) to shape-(1,), corrupting the manifest
    leaves = [np.asarray(l, order="C") for l in
              jax.tree_util.tree_leaves(state_np)]
    manifest = json.dumps(
        [[list(l.shape), l.dtype.name] for l in leaves]).encode()
    f.write(_CKPT_MAGIC)
    for blob in (meta_bytes, manifest):
        f.write(len(blob).to_bytes(8, "little"))
        f.write(blob)
    for l in leaves:
        f.write(l.tobytes())


def _read_ckpt_v2(f, state_template):
    import jax

    meta_len = int.from_bytes(f.read(8), "little")
    meta = json.loads(f.read(meta_len).decode())
    man_len = int.from_bytes(f.read(8), "little")
    manifest = json.loads(f.read(man_len).decode())
    t_leaves, treedef = jax.tree_util.tree_flatten(state_template)
    if len(manifest) != len(t_leaves):
        raise ValueError(
            f"checkpoint has {len(manifest)} leaves, template expects "
            f"{len(t_leaves)} — structure mismatch")
    buf = f.read()
    out, off = [], 0
    for li, ((shape, dtype_name), tmpl) in enumerate(zip(manifest, t_leaves)):
        dt = _np_dtype(dtype_name)
        # validate against the template (v1's from_bytes did this): a same-
        # leaf-count checkpoint from a different config must fail loudly here,
        # not as a confusing jit error / silent dtype drift later
        t_shape = tuple(getattr(tmpl, "shape", ()) or ())
        t_dtype = getattr(tmpl, "dtype", None)
        if tuple(shape) != t_shape or (
                t_dtype is not None and dt != np.dtype(t_dtype)):
            raise ValueError(
                f"checkpoint leaf {li} is {dtype_name}{tuple(shape)} but the "
                f"state template expects "
                f"{np.dtype(t_dtype).name if t_dtype is not None else '?'}"
                f"{t_shape} — wrong config for this checkpoint?")
        n = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
        out.append(np.frombuffer(buf, dt, count=int(np.prod(shape,
                   dtype=np.int64)), offset=off).reshape(shape))
        off += n
    return treedef.unflatten(out), meta


def begin_save(
    checkpoint_dir: str,
    state,
    cfg=None,
    stats=None,
    train_vars=None,
    best: bool = True,
    step: Optional[int] = None,
):
    """Critical-path half of a checkpoint save: serialize the host metadata
    (cfg/stats/train_vars mutate as training continues, so this must happen
    at save time) and DISPATCH the on-device leaf packing, without waiting
    for the fetch. Returns an opaque context for :func:`finish_save`, which
    a write-behind worker can complete off the training loop's critical path
    — the packed buffers are fresh, so later (donated) train steps cannot
    invalidate them. Pass ``step`` (the loop's host-side counter — dispatch
    order guarantees it equals ``state.step`` here) to avoid the one
    blocking scalar fetch (~74 ms through the relay)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    if step is None:
        step = int(state.step)

    meta_bytes = json.dumps(
        {
            "step": step,
            "cfg": cfg.to_dict() if cfg is not None else None,
            "stats": stats.to_dict() if stats is not None else None,
            "train_vars": train_vars.to_dict() if train_vars is not None else None,
        },
        default=_jsonable,
    ).encode()
    return (checkpoint_dir, step, meta_bytes, _snapshot_dispatch(state),
            state, best)


def finish_save(ctx) -> str:
    """Complete a :func:`begin_save`: fetch the packed leaves, write the v2
    file atomically, refresh ``best.ckpt``. Returns the checkpoint path."""
    checkpoint_dir, step, meta_bytes, snap_ctx, state, best = ctx
    state_np = state if snap_ctx is None else _snapshot_finish(snap_ctx)

    path = _ckpt_path(checkpoint_dir, step)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        _write_ckpt_v2(f, state_np, meta_bytes)
    os.replace(tmp, path)

    if best:
        # hardlink instead of a ~120 MB copy per save: checkpoint files are
        # write-once (atomic replace above), so sharing the inode is safe —
        # pruning the step file later leaves best.ckpt's content intact
        best_path = os.path.join(checkpoint_dir, "best.ckpt")
        tmp_best = best_path + ".tmp"
        try:
            if os.path.lexists(tmp_best):
                os.remove(tmp_best)
            os.link(path, tmp_best)
            os.replace(tmp_best, best_path)
        except OSError:  # cross-device / FS without hardlinks
            shutil.copyfile(path, best_path)
    return path


def save_ckpt(
    checkpoint_dir: str,
    state,
    cfg=None,
    stats=None,
    train_vars=None,
    best: bool = True,
):
    """Serialize the full training state at ``state.step``. Atomic (tmp +
    rename); also refreshes ``best.ckpt`` when ``best`` (the reference copies
    unconditionally — Stats.is_best() is a True stub). Synchronous; the
    training loop's write-behind path uses :func:`begin_save` +
    :func:`finish_save` directly."""
    return finish_save(begin_save(
        checkpoint_dir, state, cfg, stats, train_vars, best))


def latest_ckpt(checkpoint_dir: str) -> Optional[str]:
    files = sorted(glob.glob(os.path.join(checkpoint_dir, "[0-9]" * 6 + ".ckpt")))
    return files[-1] if files else None


def prune_ckpts(checkpoint_dir: str, keep_last: Optional[int],
                keep_every: Optional[int] = None) -> list:
    """Retention policy for long runs (the reference keeps every checkpoint;
    at its 50-epoch icons recipe that is ~833 x 41 MB = 34 GB). Keeps the
    newest ``keep_last`` step checkpoints plus every step that is a multiple
    of ``keep_every`` (periodic milestones for post-hoc curve evals);
    ``best.ckpt`` is never touched. ``keep_last=None`` disables pruning
    (reference behavior). Returns the deleted paths."""
    if keep_last is None:
        return []
    files = sorted(glob.glob(os.path.join(checkpoint_dir, "[0-9]" * 6 + ".ckpt")))
    # Milestones: the FIRST checkpoint in each keep_every bucket. Cadences
    # are snapped to the K-step dispatch (e.g. every 1002 steps), so steps
    # almost never land EXACTLY on a keep_every multiple — an == 0 test
    # would retain nothing (this deleted the 50k/100k/150k milestones of
    # the r4 full run before being caught).
    deleted, prev_bucket = [], None
    last_window = set(files[max(len(files) - max(keep_last, 1), 0):])
    for path in files:
        step = int(os.path.basename(path).split(".")[0])
        if keep_every:
            bucket = step // keep_every
            first_in_bucket = bucket != prev_bucket
            prev_bucket = bucket
            if first_in_bucket:
                continue
        if path in last_window:
            continue
        os.remove(path)
        deleted.append(path)
    return deleted


def load_ckpt(
    path_or_dir: str,
    state_template,
    cfg=None,
    stats=None,
    train_vars=None,
) -> Tuple[object, bool]:
    """Restore state (+ cfg/stats/train_vars in place) from a checkpoint file
    or the latest one in a directory. Returns (state, found)."""
    path = path_or_dir
    if os.path.isdir(path_or_dir):
        path = latest_ckpt(path_or_dir)
        if path is None:
            return state_template, False
    if not os.path.exists(path):
        return state_template, False

    with open(path, "rb") as f:
        if f.read(len(_CKPT_MAGIC)) == _CKPT_MAGIC:
            state, meta = _read_ckpt_v2(f, state_template)
        else:  # v1: npz with msgpack state (pre-r4 checkpoints)
            f.seek(0)
            with np.load(f, allow_pickle=False) as z:
                state = serialization.from_bytes(
                    state_template, z["state"].tobytes())
                meta = json.loads(z["meta"].tobytes().decode())

    if cfg is not None and meta.get("cfg"):
        cfg.load_dict(meta["cfg"])
    if stats is not None and meta.get("stats"):
        stats.load_dict(meta["stats"])
    if train_vars is not None and meta.get("train_vars"):
        train_vars.load_dict(meta["train_vars"])
    return state, True


def save_model(path: str, params):
    """Weights-only save (inference artifact; reference ``load_model``
    counterpart)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_model(path: str, params_template):
    """Weights-only restore (reference train_utils.py:147-156)."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:len(_CKPT_MAGIC)] == _CKPT_MAGIC or raw[:4] == b"PK\x03\x04":
        raise ValueError(
            f"{path} is a full TRAIN checkpoint (params + optimizer state); "
            "restore it with load_ckpt(path, state_template) or "
            "inference.load_session (which sniffs the format)")
    return serialization.from_bytes(params_template, raw)
