"""Microbench: K-step scanned dispatch vs K single-step dispatches.

Isolates (a) per-dispatch host overhead (RPC latency through the remote
relay) from (b) any slowdown of the scanned train-step graph itself.
Batches pre-staged on device in both arms; synchronization by fetching the
loss scalar.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from configs_tpu.hierarchical_ordered import Config
    from deepsvg_tpu.data.loader import compress_batch
    from deepsvg_tpu.data.synthetic import generate_batch
    from deepsvg_tpu.training.trainer import (
        create_train_state, jit_train_multi_step, jit_train_step)

    B, K = 128, 8
    cfg = Config(1)
    model = cfg.make_model()
    model_args = cfg.model_args
    rng = np.random.default_rng(0)
    batches = []
    for i in range(K):
        b = generate_batch(np.random.default_rng(i), B,
                           cfg.model_cfg.max_num_groups,
                           cfg.model_cfg.max_seq_len)
        b = compress_batch({k: b[k] for k in set(model_args)})
        batches.append({k: jnp.asarray(v) for k, v in b.items()})
    stacked = {k: jnp.asarray(np.stack([np.asarray(b[k]) for b in batches]))
               for k in batches[0]}

    optimizer = cfg.make_optimizer(1000)
    state = create_train_state(model, optimizer, batches[0], model_args)

    weights = cfg.get_weights(0, 0)
    weights = {k: jnp.asarray(float(v)) for k, v in weights.items()}

    step1 = jit_train_step(model, optimizer, model_args, donate=False)
    multi = jit_train_multi_step(model, optimizer, model_args,
                                 lambda s: cfg.get_weights(s, 0), donate=False)

    def run_singles():
        st = state
        for i in range(K):
            st, res = step1(st, batches[i], weights)
        return float(res["loss"])

    def run_multi():
        st, res = multi(state, stacked)
        return float(res["loss"][-1])

    # warm (compile both)
    run_singles(); run_multi()

    for name, fn in [("K singles ", run_singles), ("K-scan    ", run_multi)]:
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3:8.1f} ms total, {best/K*1e3:6.1f} ms/step, "
              f"{B*K/best:,.0f} samples/s", flush=True)


if __name__ == "__main__":
    main()
