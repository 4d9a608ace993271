"""AR greedy-decode throughput: fused whole-stack step vs einsum KV cache.

One-stage model, T = 60 tokens, batch 256, bf16 (the docs/PERFORMANCE.md
"Autoregressive greedy decode" configuration). Chained-scan timing.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import dataclasses
import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.data.synthetic import generate_batch
    from deepsvg_tpu.models import ModelConfig, SVGTransformer
    from deepsvg_tpu.models.sample import (
        autoregressive_sample_cached, autoregressive_sample_fused)

    B = 256
    cfg = ModelConfig(
        encode_stages=1, decode_stages=1, use_vae=False,
        pred_mode="autoregressive", rel_targets=False,
        max_num_groups=1, max_seq_len=60,  # max_total_len 60
        compute_dtype="bfloat16",
    )
    print("max_total_len:", cfg.max_total_len)
    model = SVGTransformer(cfg)
    rng = np.random.default_rng(0)
    b = generate_batch(rng, B, 1, cfg.max_total_len)
    cmds, args = jnp.asarray(b["commands"]), jnp.asarray(b["args"])
    variables = model.init({"params": jax.random.PRNGKey(0)}, cmds, args, cmds, args)
    z0 = model.apply(variables, cmds, args, None, None, encode_mode=True)

    model_p = SVGTransformer(dataclasses.replace(cfg, attention_impl="pallas"))

    def bench(fn, tag, n=6):
        @functools.partial(jax.jit, static_argnums=(1,))
        def chain(z, k):
            def body(zc, _):
                c, a = fn(z=zc * 0.0 + z)  # keep data dependency on carry
                # feed a checksum back so iterations serialize
                s = jnp.sum(c.astype(jnp.float32)) * 1e-9
                return zc + s.astype(zc.dtype), None
            zf, _ = jax.lax.scan(body, z, None, length=k)
            return jnp.sum(zf)

        def once(k):
            t0 = time.perf_counter()
            np.asarray(chain(z0, k))
            return time.perf_counter() - t0

        once(1)       # compile k=1
        once(1 + n)   # compile k=1+n
        t1 = min(once(1) for _ in range(3))
        tn = min(once(1 + n) for _ in range(3))
        per = (tn - t1) / n
        print(f"{tag}: {per*1e3:.1f} ms/decode  {B/per:,.0f} seq/s  "
              f"{B*cfg.max_total_len/per:,.0f} tok/s")
        return B / per

    cached = bench(
        lambda z: autoregressive_sample_cached(model, variables, z),
        "einsum KV-cached scan",
    )
    fused = bench(
        lambda z: autoregressive_sample_fused(model_p, variables, z),
        "fused decode-stack   ",
    )
    print(f"speedup: {fused/cached:.2f}x")


if __name__ == "__main__":
    main()
