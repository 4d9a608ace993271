"""Ahead-of-time export of the inference graphs for serving.

The reference has no deployment story beyond "load the checkpoint in a
torch process" (reference deepsvg/utils/utils.py `load_model` +
notebooks). On TPU the natural serving artifact is the *compiled graph
itself*: ``jax.export`` serializes the jitted encode / decode functions —
weights baked in as constants, Pallas kernels included as custom calls —
to a versioned StableHLO blob that a serving process deserializes and
calls WITHOUT the model code, the flax module tree, or the checkpoint
importer on its import path. One file on disk = the whole model.

Usage::

    from deepsvg_tpu.serving import export_session, load_session_exports

    paths = export_session(model, variables, out_dir, batch_sizes=(1, 64))
    fns = load_session_exports(out_dir)           # in the serving process
    z = fns["encode"][64](commands, args)          # fixed-batch entries
    cmds, args_out = fns["decode"][64](z)

Shapes are exported per batch size (TPU serving wants static shapes; pick
the bucket sizes you serve). Each entry is a plain callable on jax arrays.

Artifact layout: ``<out_dir>/manifest.json`` plus one ``.jaxexport`` blob
per (function, batch-size) pair.
"""
from __future__ import annotations

import json
import os
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .models.model import SVGTransformer
from .models.sample import greedy_sample

_MANIFEST = "manifest.json"


def _encode_fn(model: SVGTransformer, variables, with_label: bool):
    if with_label:
        def encode(commands, args, label):
            return model.apply(variables, commands, args, None, None,
                               label=label, encode_mode=True,
                               deterministic=True)
    else:
        def encode(commands, args):
            return model.apply(variables, commands, args, None, None,
                               encode_mode=True, deterministic=True)
    return encode


def _decode_fn(model: SVGTransformer, variables, with_label: bool):
    if with_label:
        def decode(z, label):
            return greedy_sample(model, variables, z=z, label=label)
    else:
        def decode(z):
            return greedy_sample(model, variables, z=z)
    return decode


def export_session(model: SVGTransformer, variables, out_dir: str,
                   batch_sizes: Sequence[int] = (1, 64),
                   with_label: bool | None = None) -> dict:
    """Export encode+decode at each batch size; returns {name: {B: path}}.

    ``with_label``: include a label operand on decode (defaults to the
    model config's ``label_condition``).
    """
    from jax import export as jexport

    cfg = model.cfg
    if with_label is None:
        with_label = bool(cfg.label_condition)
    os.makedirs(out_dir, exist_ok=True)

    def specs_encode(b):
        # canonical input dtypes (data/loader.py decompress_batch):
        # int32 commands, float32 quantized args, int32 labels. One-stage
        # encoders consume the packed flat sequence [B, 1, T+2] (model_args
        # "commands_grouped", config.get_model_args), not [G, S] tensors.
        if cfg.encode_stages <= 1:
            shape_c = (b, 1, cfg.max_total_len + 2)
        else:
            shape_c = (b, cfg.max_num_groups, cfg.max_seq_len + 2)
        specs = [
            jax.ShapeDtypeStruct(shape_c, jnp.int32),
            jax.ShapeDtypeStruct(shape_c + (cfg.n_args,), jnp.float32),
        ]
        if with_label:
            specs.append(jax.ShapeDtypeStruct((b,), jnp.int32))
        return tuple(specs)

    def specs_decode(b):
        specs = [jax.ShapeDtypeStruct((b, cfg.dim_z), jnp.float32)]
        if with_label:
            specs.append(jax.ShapeDtypeStruct((b,), jnp.int32))
        return tuple(specs)

    fns = {
        "encode": (_encode_fn(model, variables, with_label), specs_encode),
        "decode": (_decode_fn(model, variables, with_label), specs_decode),
    }
    # per-entry pad fills, one per operand IN ORDER, written at export time
    # when the operand roles are known — serve_batch reads these back rather
    # than guessing roles from rank/dtype at call time. Wire contract
    # (data/loader.py decompress_batch): commands pad with EOS 4, quantized
    # args with -1, labels and latents with 0.
    pad_spec = {
        "encode": [4, -1.0] + ([0] if with_label else []),
        "decode": [0.0] + ([0] if with_label else []),
    }
    manifest = {"batch_sizes": list(map(int, batch_sizes)),
                "with_label": with_label, "pad": pad_spec, "entries": {}}
    paths: dict = {}
    for name, (fn, specs) in fns.items():
        paths[name] = {}
        for b in batch_sizes:
            exp = jexport.export(jax.jit(fn))(*specs(int(b)))
            fname = f"{name}_b{int(b)}.jaxexport"
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(exp.serialize())
            manifest["entries"][f"{name}:{int(b)}"] = fname
            paths[name][int(b)] = os.path.join(out_dir, fname)
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return paths


def load_session_exports(out_dir: str) -> dict:
    """Deserialize every exported entry: {name: {batch_size: callable}}.

    Needs only jax on the serving host — no deepsvg_tpu model code, no
    checkpoint. Entry signatures are exact per bucket; use
    :func:`serve_batch` to route arbitrary batch sizes (it pads to the next
    bucket and un-pads the outputs). Decode takes float32 latents (cast a
    bf16 encode output with ``z.astype(jnp.float32)``)."""
    from jax import export as jexport

    with open(os.path.join(out_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    out: dict = {}
    for key, fname in manifest["entries"].items():
        name, b = key.split(":")
        with open(os.path.join(out_dir, fname), "rb") as f:
            exp = jexport.deserialize(bytearray(f.read()))
        out.setdefault(name, {})[int(b)] = exp.call
    # per-entry pad fills for serve_batch; pre-"pad"-manifest artifacts get
    # the known encode/decode contract (the only entries ever exported then)
    pad = manifest.get("pad")
    if pad is None:
        wl = bool(manifest.get("with_label"))
        pad = {"encode": [4, -1.0] + ([0] if wl else []),
               "decode": [0.0] + ([0] if wl else [])}
    out["__pad__"] = pad
    return out


def serve_batch(fns: dict, name: str, *args):
    """Bucket-routed call: pad a variable-size batch to the smallest
    exported bucket, dispatch, and un-pad the outputs.

    ``fns`` is :func:`load_session_exports`'s result; ``name`` is the entry
    ("encode"/"decode"); ``args`` are the entry's operands with a common
    leading batch dimension of any size <= the largest bucket. Pad fills
    come from the per-entry, per-operand spec the EXPORT wrote into the
    manifest (``export_session`` pad_spec — commands EOS 4, args -1,
    labels/latents 0), so no operand-role guessing happens at call time.
    Outputs are sliced back to the true batch size.
    """
    entries = fns[name]
    n = int(args[0].shape[0])
    buckets = sorted(entries)
    fit = [b for b in buckets if b >= n]
    if not fit:
        raise ValueError(
            f"batch {n} exceeds the largest exported bucket {buckets[-1]} "
            f"for {name!r}; export a bigger bucket or split the batch")
    b = fit[0]
    fills = fns.get("__pad__", {}).get(name)
    if fills is None or len(fills) != len(args):
        raise ValueError(
            f"no pad spec for entry {name!r} with {len(args)} operands "
            f"(manifest pad: {fns.get('__pad__')}) — re-export with "
            "export_session or pass operands matching the export signature")

    def pad(x, fill):
        x = jnp.asarray(x)
        if x.shape[0] == b:
            return x
        padshape = (b - x.shape[0],) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(padshape, fill, x.dtype)], axis=0)

    out = entries[b](*(pad(a, f) for a, f in zip(args, fills)))
    unpad = lambda y: y[:n] if hasattr(y, "shape") and y.shape and y.shape[0] == b else y
    if isinstance(out, (tuple, list)):
        return type(out)(unpad(y) for y in out)
    return unpad(out)


def main(argv=None):
    """CLI: export a trained config+checkpoint to a serving directory."""
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config-module", required=True)
    ap.add_argument("--checkpoint", required=True,
                    help=".pth.tar (reference) or orbax dir (ours)")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--batch-sizes", default="1,64")
    args = ap.parse_args(argv)

    from .inference import load_session

    session = load_session(args.config_module, args.checkpoint)
    sizes = tuple(int(s) for s in args.batch_sizes.split(","))
    paths = export_session(session.model, session.variables, args.out_dir,
                           batch_sizes=sizes)
    n = sum(len(v) for v in paths.values())
    print(f"exported {n} entries to {args.out_dir}")


if __name__ == "__main__":
    main()
