"""On-chip A/B at the MODEL level: flagship training step at the recipe
batch (B=60) with the hierarchical stages on the stack-fused kernels
(ops/stack_vjp.py, STACK_FUSED_ENABLED=True) vs the per-layer fused kernels.

One jitted graph per variant (the per-layer one is warm in the persistent
compile cache from the production run). Loss parity between the variants is
checked from identical params at dropout 0 before timing at dropout 0.1.

Run on the chip: python scripts/exp_stack_model_ab.py [--batch 60]
"""
from __future__ import annotations

import argparse
import functools
import json
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

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=60)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from configs_tpu.hierarchical_ordered import Config
    from deepsvg_tpu.data.synthetic import generate_batch
    from deepsvg_tpu.models import layers as L
    from deepsvg_tpu.training.trainer import create_train_state, train_step

    cfg = Config(1)
    model = cfg.make_model()
    rng = np.random.default_rng(0)
    b = generate_batch(rng, args.batch, model.cfg.max_num_groups,
                       model.cfg.max_seq_len)
    batch = {k: jnp.asarray(v) for k, v in b.items()
             if k in set(cfg.model_args)}
    print("[setup] init state (first on-chip compile)...", flush=True)
    state = create_train_state(model, cfg.make_optimizer(1000), batch,
                               cfg.model_args)
    print("[setup] state ready", flush=True)

    res = {"batch": args.batch}
    times = {}
    for flag in (True, False):
        L.STACK_FUSED_ENABLED = flag
        step = jax.jit(functools.partial(
            train_step, model=model, optimizer=cfg.make_optimizer(1000),
            model_args=cfg.model_args))

        def run(st, n):
            def body(c, _):
                c2, r = step(c, batch, WEIGHTS)
                return c2, r["loss"]
            return jax.lax.scan(body, st, None, length=n)

        runj = jax.jit(run, static_argnums=(1,))
        name = "stack" if flag else "per_layer"
        st1, l1 = runj(state, 1)
        res[f"loss_1step_{name}"] = float(np.asarray(l1)[-1])
        print(f"[{name}] compiled; 1-step loss {res[f'loss_1step_{name}']:.5f}",
              flush=True)
        n = args.iters
        runj(state, 1 + n)
        b1 = bN = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(runj(state, 1)[1])[-1])
            b1 = min(b1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(np.asarray(runj(state, 1 + n)[1])[-1])
            bN = min(bN, time.perf_counter() - t0)
        ms = (bN - b1) / n * 1e3
        times[name] = ms
        res[f"ms_per_step_{name}"] = round(ms, 3)
        print(f"[{name}] {ms:.3f} ms/step at B={args.batch}", flush=True)

    res["speedup_pct"] = round(
        100 * (times["per_layer"] / times["stack"] - 1), 2)
    res["loss_rel_diff"] = abs(
        res["loss_1step_stack"] - res["loss_1step_per_layer"]
    ) / max(abs(res["loss_1step_per_layer"]), 1e-9)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "stack_ab.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
