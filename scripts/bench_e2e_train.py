"""End-to-end training wall-clock: the full train() loop (loader threads,
device prefetch, jitted step, stats) on the real chip.

Prior measurement (docs/PERFORMANCE.md "Training loss curve"): 204 samples/s
end-to-end vs 789/s device-only — the per-step host->device transfer through
the remote relay sat on the critical path. ``prefetch_to_device`` overlaps
it; this script measures what the loop actually delivers now.

Method: two runs sharing a warm compile cache and one dataset instance; the
second run's extra steps are all hot, so
``samples/s = (steps2 - steps1) * B / (t2 - t1)`` cancels compile + setup.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from configs_tpu.hierarchical_ordered import Config
    from deepsvg_tpu.data.synthetic import SyntheticIconDataset
    from deepsvg_tpu.training.train import train

    B = 128
    cfg = Config(1)
    cfg.batch_size = B
    cfg.log_every = 10_000
    cfg.val_every = 10_000
    cfg.ckpt_every = 10_000
    cfg.loader_num_workers = 8
    import os
    # K=1 is the production default for STREAMING; resident mode picks K=8
    # itself. BENCH_K overrides; BENCH_RESIDENT=0 forces the streaming
    # pipeline for A/B (default: "auto" = resident when supported).
    cfg.steps_per_dispatch = int(os.environ.get("BENCH_K", "1"))
    if os.environ.get("BENCH_RESIDENT", "") == "0":
        cfg.device_resident = False

    ds = SyntheticIconDataset(
        n=8192, max_num_groups=cfg.model_cfg.max_num_groups,
        max_seq_len=cfg.model_cfg.max_seq_len,
    )
    # warm the in-memory dataset cache so generation cost isn't measured
    for i in range(len(ds)):
        ds[i]

    # Steady-state timing from INSIDE one run: the loop's per-log-window
    # interval times are wall clock between consecutive log fetches (each a
    # hard sync point). The FIRST window absorbs trace+compile and is
    # dropped; the rest are pure pipeline + one ~30 ms fetch stall per
    # window (bias +30/log_every ms/step, ~0.2 ms at log_every=160 —
    # noted, not subtracted). Two-run difference methods proved unusable
    # here: single-core host tracing noise (seconds) swamps the signal.
    cfg.log_every = 160
    _, stats = train(cfg, "bench", "e2e", log_dir="/tmp/bench_e2e_logs",
                     debug=True, dataset=ds, max_steps=1600)
    windows = list(stats.stats["train"]["time"].deque)[1:]
    t = sum(windows) / max(len(windows), 1)
    print(f"end-to-end training: {B/t:,.0f} samples/s "
          f"({t*1e3:.1f} ms/step incl. input pipeline over "
          f"{len(windows)} x {cfg.log_every}-step windows; device-only step "
          f"is ~28.7 ms at this batch — scripts/profile_train.py)")

    # training MFU: fwd FLOPs x3 (backward ~2x forward), matmul MACs only
    from deepsvg_tpu.utils.flops import flops_per_sample, peak_flops_per_chip
    gflops = 3 * flops_per_sample(cfg.model_cfg) / 1e9
    peak = peak_flops_per_chip(jax.devices()[0].device_kind)
    if peak:
        achieved = (B / t) * gflops * 1e9
        print(f"training MFU: {gflops:.2f} GFLOPs/sample(train) -> "
              f"{achieved/1e12:.1f} TFLOPs = {achieved/peak:.1%} of "
              f"{peak/1e12:.0f} TF/s peak")


if __name__ == "__main__":
    main()
