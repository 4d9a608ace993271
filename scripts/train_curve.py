"""600-step training-curve validation on the real chip.

Same recipe as docs/train_curve_fused.json: flagship model, synthetic icons,
batch 128, bf16, dropout 0.1. Variants (argv[1]):
  fusedlayer    - hierarchical_ordered, pallas fully-fused path (default)
  selfmatch     - hierarchical self-matching, fused pairwise-cost path
  selfmatch_xla - hierarchical self-matching, stock XLA path (parity twin)
  long          - hierarchical_ordered, pallas, 5000-step stability soak
Writes docs/train_curve_<variant>.json.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import sys
import time

import numpy as np


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "fusedlayer"
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from deepsvg_tpu.data.synthetic import generate_batch
    from deepsvg_tpu.models import ModelConfig, SVGTransformer
    from deepsvg_tpu.training.schedulers import warmup_step_decay
    from deepsvg_tpu.training.trainer import (
        create_train_state, jit_train_step, make_optimizer)

    B, STEPS = 128, (5000 if variant == "long" else 600)
    cfg = ModelConfig(
        encode_stages=2, decode_stages=2, use_vae=False,
        self_match=variant.startswith("selfmatch"),
        compute_dtype="bfloat16",
        attention_impl="xla" if variant.endswith("_xla") else "pallas",
        dropout=0.1,
    )
    model = SVGTransformer(cfg)
    margs = cfg.get_model_args()

    rng = np.random.default_rng(0)
    sample = {k: jnp.asarray(v) for k, v in
              generate_batch(rng, B, cfg.max_num_groups, cfg.max_seq_len).items()
              if k in set(margs)}
    opt = make_optimizer(warmup_step_decay(1e-3, 500, 2500))
    state = create_train_state(model, opt, sample, margs)
    step = jit_train_step(model, opt, margs)
    weights = dict(kl_tolerance=0.1, loss_kl_weight=1.0,
                   loss_visibility_weight=1.0, loss_cmd_weight=1.0,
                   loss_args_weight=2.0)

    # pre-generate a rotating pool of batches (host RNG off the clock)
    pool = [
        {k: jnp.asarray(v) for k, v in
         generate_batch(rng, B, cfg.max_num_groups, cfg.max_seq_len).items()
         if k in set(margs)}
        for _ in range(20)
    ]

    state, _ = step(state, pool[0], weights)  # compile
    t0 = time.time()
    curve = {"steps": [], "loss": [], "loss_cmd": [], "loss_args": []}
    for i in range(1, STEPS + 1):
        state, res = step(state, pool[i % len(pool)], weights)
        if i % (250 if variant == "long" else 50) == 0:
            curve["steps"].append(i)
            curve["loss"].append(float(res["loss"]))
            curve["loss_cmd"].append(float(res["loss_cmd"]))
            curve["loss_args"].append(float(res["loss_args"]))
            print(i, float(res["loss"]), float(res["loss_cmd"]),
                  float(res["loss_args"]), flush=True)
    wall = time.time() - t0
    curve["batch_size"] = B
    curve["wall_seconds"] = wall
    curve["path"] = (f"{cfg.attention_impl} backend, self_match={cfg.self_match}, "
                     "bf16, dropout 0.1")
    with open(f"docs/train_curve_{variant}.json", "w") as f:
        json.dump(curve, f)
    print("wall:", wall)


if __name__ == "__main__":
    main()
