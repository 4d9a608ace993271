"""Benchmark: flagship encode+decode throughput on one TPU chip.

Measures end-to-end (encoder E1/E2 -> bottleneck -> decoder D2/D1 -> greedy
one-shot sampling) samples/sec on the full-size hierarchical_ordered model
(d_model 256, 4+4 layers x 2 stages, G=8, S=30 — BASELINE.md model dims).

North star (BASELINE.json): >=10k icons/s/chip. The reference publishes no
numbers; ``vs_baseline`` is value / 10_000 (fraction of the north-star target).

Prints ONE JSON line.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from deepsvg_tpu.data.synthetic import generate_batch
    from deepsvg_tpu.models import ModelConfig, SVGTransformer
    from deepsvg_tpu.models.sample import one_shot_sample

    cfg = ModelConfig(
        encode_stages=2, decode_stages=2, use_vae=False,
        compute_dtype="bfloat16",
    )
    model = SVGTransformer(cfg)

    batch_size = 2048
    rng = np.random.default_rng(0)
    b = generate_batch(rng, batch_size, cfg.max_num_groups, cfg.max_seq_len)
    cmds = jnp.asarray(b["commands"])
    args = jnp.asarray(b["args"])

    variables = model.init({"params": jax.random.key(0)}, cmds, args, cmds, args)

    @jax.jit
    def encode_decode(params, commands, args_):
        return one_shot_sample(model, {"params": params}, commands_enc=commands,
                               args_enc=args_)

    params = variables["params"]
    # warmup + compile
    out = encode_decode(params, cmds, args)
    jax.block_until_ready(out)

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = encode_decode(params, cmds, args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    samples_per_sec = batch_size * n_iters / dt
    print(json.dumps({
        "metric": "flagship_encode_decode_throughput",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(samples_per_sec / 10_000, 3),
    }))


if __name__ == "__main__":
    main()
