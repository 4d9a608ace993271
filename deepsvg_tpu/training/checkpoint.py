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
    unconditionally — Stats.is_best() is a True stub)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    step = int(state.step)

    payload = {
        "state": serialization.to_bytes(state),
        "meta": json.dumps(
            {
                "step": step,
                "cfg": cfg.to_dict() if cfg is not None else None,
                "stats": stats.to_dict() if stats is not None else None,
                "train_vars": train_vars.to_dict() if train_vars is not None else None,
            },
            default=_jsonable,
        ).encode(),
    }

    path = _ckpt_path(checkpoint_dir, step)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)

    if best:
        shutil.copyfile(path, os.path.join(checkpoint_dir, "best.ckpt"))
    return path


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
    deleted = []
    for path in files[: max(len(files) - max(keep_last, 1), 0)]:
        step = int(os.path.basename(path).split(".")[0])
        if keep_every and step % keep_every == 0:
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

    with np.load(path, allow_pickle=False) as z:
        state = serialization.from_bytes(state_template, z["state"].tobytes())
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
        return serialization.from_bytes(params_template, f.read())
