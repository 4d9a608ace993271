"""Capture a device trace of the flagship fused inference iteration and print
the top ops by total duration (parsed from the Perfetto/Chrome trace JSON —
no tensorboard plugin needed).

Usage: PYTHONPATH=/root/repo python scripts/trace_inference.py [train]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import glob
import os
import sys
from collections import defaultdict

import numpy as np

TRACE_DIR = "/tmp/deepsvg_trace"


def capture_inference():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.data.synthetic import generate_batch
    from deepsvg_tpu.models import ModelConfig, SVGTransformer
    from deepsvg_tpu.models.sample import one_shot_sample

    cfg = ModelConfig(
        encode_stages=2, decode_stages=2, use_vae=False,
        compute_dtype="bfloat16", attention_impl="pallas",
    )
    model = SVGTransformer(cfg)
    rng = np.random.default_rng(0)
    b = generate_batch(rng, 1024, cfg.max_num_groups, cfg.max_seq_len)
    cmds, args = jnp.asarray(b["commands"]), jnp.asarray(b["args"])
    variables = model.init({"params": jax.random.PRNGKey(0)}, cmds, args, cmds, args)

    import functools

    @functools.partial(jax.jit, static_argnums=(3,))
    def chain(params, c, a, n):
        def body(carry, _):
            c, a = carry
            oc, oa = one_shot_sample(model, {"params": params},
                                     commands_enc=c, args_enc=a)
            c2 = jnp.concatenate([jnp.full_like(c[..., :1], 5), oc], axis=-1)
            a2 = jnp.concatenate([jnp.full_like(a[..., :1, :], -1.0), oa], axis=-2)
            return (c2.astype(c.dtype), a2), None

        (c, a), _ = jax.lax.scan(body, (c, a), None, length=n)
        return jnp.sum(c)

    params = variables["params"]
    np.asarray(chain(params, cmds, args, 3))  # compile + warm
    jax.profiler.start_trace(TRACE_DIR)
    np.asarray(chain(params, cmds, args, 8))
    jax.profiler.stop_trace()


def top_ops(top=25):
    """Aggregate the device 'XLA Ops' lane from the xplane proto (the
    Chrome-trace json only carries host lanes through this relay; tensorflow's
    bundled tsl protos decode the device plane)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        print("no trace found"); return
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            dur = defaultdict(float)
            cnt = defaultdict(int)
            for e in line.events:
                name = evmeta.get(e.metadata_id, "?").split(" = ")[0]
                dur[name] += e.duration_ps / 1e9  # -> ms
                cnt[name] += 1
            total = sum(dur.values())
            print(f"[{plane.name}] top ops by device time "
                  f"({total:.1f} ms total):")
            for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:top]:
                print(f"  {d:9.2f} ms ({100*d/total:4.1f}%) x{cnt[name]:<4d} "
                      f"{name[:90]}")


def capture_train():
    """Trace the full flagship TRAIN step (fused layer VJPs + fused CE)."""
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.data.synthetic import generate_batch
    from deepsvg_tpu.models import ModelConfig, SVGTransformer
    from deepsvg_tpu.training.trainer import (
        create_train_state, make_optimizer, train_step)

    cfg = ModelConfig(
        encode_stages=2, decode_stages=2, use_vae=False,
        compute_dtype="bfloat16", attention_impl="pallas", dropout=0.1,
    )
    model = SVGTransformer(cfg)
    rng = np.random.default_rng(0)
    b = generate_batch(rng, 128, cfg.max_num_groups, cfg.max_seq_len)
    data = {"commands": jnp.asarray(b["commands"]),
            "args": jnp.asarray(b["args"])}
    optimizer = make_optimizer(optax.constant_schedule(1e-3))
    state = create_train_state(model, optimizer, data,
                               ["commands", "args"] * 2)
    weights = dict(kl_tolerance=0.1, loss_kl_weight=1.0,
                   loss_visibility_weight=1.0, loss_cmd_weight=1.0,
                   loss_args_weight=2.0)

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain(state, data, n):
        def body(st, _):
            st, res = train_step(st, data, weights, model, optimizer,
                                 ["commands", "args"] * 2)
            return st, res["loss"]
        st, losses = jax.lax.scan(body, state, None, length=n)
        return losses[-1]

    np.asarray(chain(state, data, 3))  # compile + warm
    jax.profiler.start_trace(TRACE_DIR)
    np.asarray(chain(state, data, 8))
    jax.profiler.stop_trace()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "train":
        capture_train()
    else:
        capture_inference()
    top_ops()
