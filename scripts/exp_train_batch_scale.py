"""Training-step throughput vs per-chip batch size.

The flagship layers at B=128 run ~3.4x their MXU floor: d_model=256 makes
per-token matmul FLOPs small relative to fixed per-block elementwise work
(f32 LN, softmax, casts), so larger per-chip batches raise MXU utilization
until VMEM/HBM push back. This sweeps the REAL fused train step across
batch sizes to find the production operating point (dropout 0.1, bf16,
fused VJP kernels — identical math at every B).

Run on the chip: python scripts/exp_train_batch_scale.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WEIGHTS = dict(kl_tolerance=0.1, loss_kl_weight=1.0,
               loss_visibility_weight=1.0, loss_cmd_weight=1.0,
               loss_args_weight=2.0)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.data.synthetic import generate_batch
    from deepsvg_tpu.models import ModelConfig, SVGTransformer
    from deepsvg_tpu.training.trainer import (
        create_train_state, make_optimizer, train_step)
    from deepsvg_tpu.utils.flops import flops_per_sample, peak_flops_per_chip

    cfg = ModelConfig(encode_stages=2, decode_stages=2, use_vae=False,
                      compute_dtype="bfloat16", attention_impl="pallas",
                      dropout=0.1)
    model = SVGTransformer(cfg)
    model_args = ["commands", "args"] * 2
    fps = flops_per_sample(cfg)
    peak = peak_flops_per_chip(jax.devices()[0].device_kind) or 197e12

    for B in (128, 256, 512, 1024):
        rng = np.random.default_rng(0)
        b = generate_batch(rng, B, cfg.max_num_groups, cfg.max_seq_len)
        data = {"commands": jnp.asarray(b["commands"]),
                "args": jnp.asarray(b["args"])}
        optimizer = make_optimizer(optax.constant_schedule(1e-3))
        state = create_train_state(model, optimizer, data, model_args)

        @functools.partial(jax.jit, static_argnums=(2,))
        def chain(st, d, n):
            def body(s, _):
                s, res = train_step(s, d, WEIGHTS, model, optimizer,
                                    model_args)
                return s, res["loss"]
            _, losses = jax.lax.scan(body, st, None, length=n)
            return losses[-1]

        def timed(n, reps=3):
            np.asarray(chain(state, data, n))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(chain(state, data, n))
                best = min(best, time.perf_counter() - t0)
            return best

        try:
            per = (timed(11) - timed(1)) / 10
        except Exception as e:  # OOM at some B is an acceptable sweep end
            print(f"B={B}: failed ({type(e).__name__})")
            break
        sps = B / per
        print(f"B={B:5d}: {per*1e3:6.2f} ms/step  {sps:7.0f} samples/s  "
              f"train MFU {sps * 3 * fps / peak * 100:.1f}%")


if __name__ == "__main__":
    main()
