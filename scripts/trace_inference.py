"""Capture a device trace of the flagship fused inference iteration and print
the top ops by total duration (parsed from the Perfetto/Chrome trace JSON —
no tensorboard plugin needed).

Usage: PYTHONPATH=/root/repo python scripts/trace_inference.py [train]
"""
import glob
import gzip
import json
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


def top_ops(n_iters=8, top=25):
    files = sorted(glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        print("no trace found"); return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # TPU op events live on device-lane threads; aggregate by name
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            args = e.get("args", {})
            # keep XLA op / kernel lanes; skip host python & runtime lanes
            if "run_id" in args or "hlo_op" in args or name.startswith(
                ("fusion", "copy", "custom-call", "dynamic", "scatter",
                 "gather", "reduce", "convert", "transpose", "dot", "loop",
                 "while", "broadcast", "iota", "select", "bitcast", "concat",
                 "slice", "pad", "all-", "tpu", "Mosaic")
            ):
                dur[name] += e["dur"]
                cnt[name] += 1
    rows = sorted(dur.items(), key=lambda kv: -kv[1])[:top]
    total = sum(dur.values())
    print(f"top ops by total device time ({total/1e3:.1f} ms over ~{n_iters} iters):")
    for name, d in rows:
        print(f"  {d/1e3:9.2f} ms  ({100*d/total:4.1f}%)  x{cnt[name]:<4d} {name[:90]}")


if __name__ == "__main__":
    capture_inference()
    top_ops()
