"""Config-driven training loop + CLI (reference: deepsvg/train.py).

Differences from the reference, per the TPU-first design:
- the whole optimization step (forward/loss/backward/clip/update/schedule) is
  ONE jitted function, sharded over the device mesh (DP) when >1 device;
- loss weights (KL ramp) enter the step as traced scalars — no recompiles;
- checkpointing via flax serialization with atomic writes.

CLI: ``python -m deepsvg_tpu.training.train --config-module
configs_tpu.hierarchical_ordered [--log-dir ./logs] [--debug] [--resume]``.
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from datetime import datetime

import jax
import numpy as np

from ..data.loader import DataLoader, prefetch_to_device
from ..parallel.mesh import make_mesh, make_parallel_train_step
from .checkpoint import (begin_save, finish_save, load_ckpt, prune_ckpts,
                         save_ckpt)
from .config import TrainConfig, load_config
from .stats import Stats, Timer, TrainVars
from .trainer import create_train_state, jit_train_step


def set_seed(seed: int = 42):
    import random

    random.seed(seed)
    np.random.seed(seed)


def enable_compilation_cache(path: str = "/root/.cache/jax_comp"):
    """Persistent XLA compilation cache: repeat runs of the same configs skip
    the (30-90 s per graph on a remote TPU) compiles."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass  # older jax without the flags


def train(cfg: TrainConfig, model_name: str, experiment_name: str = "",
          log_dir: str = "./logs", debug: bool = False, resume: bool = False,
          dataset=None, max_steps: int | None = None,
          profile_steps: tuple[int, int] | None = None):
    """Main entry (reference train.py:18-135).

    ``profile_steps=(start, stop)`` captures a ``jax.profiler`` device trace
    of those optimization steps into ``<log_dir>/profile/<run>`` (viewable
    with TensorBoard's profile plugin / Perfetto). The reference has no
    profiler integration (SURVEY.md §5) — here it is one flag away.
    """
    print("Parameters")
    cfg.print_params()

    # dataset (injected or loaded via the module-path hook)
    if dataset is None:
        import importlib

        dataset_module = importlib.import_module(cfg.dataloader_module)
        dataset = dataset_module.load_dataset(cfg)
    loader = DataLoader(
        dataset, batch_size=cfg.batch_size, shuffle=True, drop_last=True,
        num_workers=cfg.loader_num_workers,
        worker_mode=getattr(cfg, "loader_worker_mode", "thread"),
    )
    steps_per_epoch = max(len(loader), 1)

    model = cfg.make_model()
    model_args = cfg.model_args

    stats = Stats(
        num_epochs=cfg.num_epochs, num_steps=cfg.num_steps,
        steps_per_epoch=steps_per_epoch, stats_to_print=cfg.stats_to_print,
    )
    train_vars = TrainVars()
    timer = Timer()

    stats.stats["train"]  # touch
    cfg.set_train_vars(train_vars, dataset)

    # log dirs (reference train.py:44-49)
    current_time = datetime.now().strftime("%b%d_%H-%M-%S")
    experiment_identifier = f"{model_name}_{experiment_name}_{current_time}"
    subdir = "debug" if debug else "full"
    summary_writer = _make_summary_writer(
        os.path.join(log_dir, "tensorboard", subdir, experiment_identifier)
    )
    checkpoint_dir = os.path.join(log_dir, "models", model_name, experiment_name)
    visualization_dir = os.path.join(log_dir, "visualization", model_name, experiment_name)
    os.makedirs(checkpoint_dir, exist_ok=True)
    os.makedirs(visualization_dir, exist_ok=True)

    # init state from one sample batch (reference init forward, train.py:66-72)
    sample_batch = next(iter(loader))
    batch_dev = {k: np.asarray(v) for k, v in sample_batch.items() if k in set(model_args)}
    optimizer = cfg.make_optimizer(steps_per_epoch)
    state = create_train_state(model, optimizer, batch_dev, model_args)

    if cfg.pretrained_path is not None:
        from .checkpoint import load_model

        state = state.replace(params=load_model(cfg.pretrained_path, state.params))

    if resume:
        state, found = load_ckpt(checkpoint_dir, state, cfg, stats, train_vars)
        if found:
            print(f"Resuming model at step {int(state.step)}")

    # device mesh: DP over the requested devices, clamped to a divisor of the
    # batch size (the batch axis shards evenly or not at all)
    n_dev = min(cfg.num_devices, jax.device_count())
    while n_dev > 1 and cfg.batch_size % n_dev != 0:
        n_dev -= 1
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    # multi-step dispatch (cfg.steps_per_dispatch = K > 1): lax.scan K
    # training steps per jitted call over a [K, B, ...]-stacked batch —
    # amortizes per-step host dispatch, which through a remote TPU relay is
    # a full RPC round trip (10-15 ms) dominating the ~29 ms step. Requires
    # traceable cfg.get_weights (the shipped configs' ramps are jnp) and a
    # single device (the shard_map path stays at K=1 for now).
    raw_k = getattr(cfg, "steps_per_dispatch", 1)
    # steps_per_dispatch=0: debug/AB knob — force the legacy per-step path
    # with host-computed weights (no scan, no in-graph ramp)
    legacy_dispatch = raw_k is not None and int(raw_k) == 0
    K = max(int(raw_k or 1), 1)
    if profile_steps is not None:
        K = 1

    def weights_fn(step):
        return cfg.get_weights(step, 0)

    # can the weight schedule trace? (shipped ramps are jnp and can; a
    # config doing data-dependent python control flow on `step` cannot —
    # it falls back to per-step host weights)
    try:
        if legacy_dispatch:
            raise ValueError("legacy dispatch requested")
        jax.eval_shape(weights_fn, jax.ShapeDtypeStruct((), np.int32))
        weights_traceable = True
    except Exception:
        weights_traceable = False
        K = 1

    # Device-resident dataset (data/resident.py): upload the whole wire-
    # compressed dataset to HBM once and gather batches on device — the
    # steady state then has NO per-step host->device traffic, and the K-step
    # scan dispatch shrinks host work to one tiny index transfer per K steps.
    resident = None
    if (weights_traceable and profile_steps is None
            and getattr(cfg, "device_resident", "auto")):
        from ..data.resident import build_resident_arrays

        import time as _time

        _t0 = _time.time()
        built = build_resident_arrays(
            dataset, model_args,
            max_bytes=getattr(cfg, "device_resident_max_bytes", 4 << 30),
            num_workers=cfg.loader_num_workers,
        )
        _t_build = _time.time() - _t0
        if built is not None:
            data_host, n_icons, n_augs = built
            # residency layout: flatten item dims to ONE lane-aligned row —
            # a narrow minor dim (args' 11) would be padded to 128 lanes and
            # the gather would repack the whole corpus into a ~6x temp
            # (compile-time OOM at 100k-corpus scale, measured)
            item_shapes = {k: v.shape[1:] for k, v in data_host.items()}
            data_host = {k: v.reshape(len(v), -1)
                         for k, v in data_host.items()}
            _t0 = _time.time()
            if mesh is not None:
                # replicate the corpus on every chip: each DP shard gathers
                # its rows locally, no cross-chip data movement per step
                from ..parallel.mesh import replicated

                data_dev = jax.device_put(data_host, replicated(mesh))
            else:
                data_dev = jax.device_put(data_host)
            jax.block_until_ready(data_dev)
            _t_upload = _time.time() - _t0
            if raw_k in (None, 1):
                # un-tuned K: amortize the per-dispatch RPC over 8 steps
                K = 8
            # never a full epoch: _resident_idx_chunks yields
            # floor(batches/K) dispatches per epoch, so K > batches-per-epoch
            # would yield NONE and the loop would spin through every epoch
            # without training a single step
            n_batches_epoch = max(len(dataset) // cfg.batch_size, 1)
            K = max(min(K, n_batches_epoch), 1)
            # ... and never overshoot an explicit step budget (incl. after
            # resume): K becomes the largest divisor of the remaining budget
            # <= K (this must run AFTER the epoch clamp — a clamp afterwards
            # could break divisibility and re-introduce the overshoot)
            for budget in (max_steps, cfg.num_steps):
                if budget is not None:
                    rem = max(budget - int(state.step), 1)
                    K = max(min(K, rem), 1)
                    while rem % K:
                        K -= 1
            resident = (data_dev, n_icons, n_augs)
            mb = sum(v.nbytes for v in data_host.values()) / 2**20
            print(f"device-resident dataset: {len(dataset)} items "
                  f"({n_augs} aug variants), {mb:.1f} MB in HBM, "
                  f"K={K} steps/dispatch "
                  f"[build {_t_build:.1f}s, upload {_t_upload:.1f}s, "
                  f"{mb / max(_t_upload, 1e-9):.0f} MB/s]")

    # K-step dispatch only observes step counts at multiples of K: round the
    # cadences up LOCALLY to the next multiple of K, so an event never fires
    # more often than configured. (Never mutate cfg — it serializes into
    # checkpoints via to_dict, and a resumed run would silently inherit a
    # cadence rounded for a K it is no longer using.)
    log_every, val_every, ckpt_every = cfg.log_every, cfg.val_every, cfg.ckpt_every
    if K > 1:
        log_every, val_every, ckpt_every = (
            -(-v // K) * K for v in (log_every, val_every, ckpt_every)
        )

    # In-graph weights whenever possible — even at K=1: passing python-float
    # weights per dispatch costs several tiny host->device transfers per
    # step, pure RPC latency through a remote TPU relay.
    if resident is not None:
        data_dev, n_icons, n_augs = resident
        if mesh is not None:
            from ..parallel.mesh import make_parallel_resident_multi_step

            _resident_fn = make_parallel_resident_multi_step(
                model, optimizer, model_args, mesh, weights_fn=weights_fn,
                n_augs=n_augs, item_shapes=item_shapes)
        else:
            from .trainer import jit_train_resident_multi_step

            _resident_fn = jit_train_resident_multi_step(
                model, optimizer, model_args, weights_fn=weights_fn,
                n_augs=n_augs, item_shapes=item_shapes)

        def step_fn(st, b, _f=_resident_fn, _d=data_dev):
            return _f(st, _d, b["idx"])

    elif mesh is not None and K > 1:
        from ..parallel.mesh import make_parallel_multi_step

        step_fn = make_parallel_multi_step(
            model, optimizer, model_args, mesh, weights_fn=weights_fn)
    elif mesh is not None:
        step_fn = make_parallel_train_step(model, optimizer, model_args, mesh)
    elif weights_traceable:
        from .trainer import jit_train_multi_step

        step_fn = jit_train_multi_step(
            model, optimizer, model_args, weights_fn=weights_fn)
    else:
        step_fn = jit_train_step(model, optimizer, model_args)

    lr_schedule = cfg.make_lr_schedule(steps_per_epoch)

    import itertools

    if max_steps is not None or cfg.num_epochs is None:
        epoch_range = itertools.count()
    else:
        epoch_range = range(cfg.num_epochs)
    first_epoch = int(state.step) // steps_per_epoch

    def _resident_idx_chunks(epoch_number: int):
        """[K, B] icon-index dicts for one epoch, DataLoader-order-exact."""
        from ..data.resident import epoch_icon_permutation

        batches = epoch_icon_permutation(
            len(dataset), resident[1], cfg.batch_size, loader.seed,
            epoch_number)
        for i in range(0, (len(batches) // K) * K, K):
            yield {"idx": batches[i : i + K]}

    resident_epochs = 0
    done = False
    # host-side step counter: fetching int(state.step) every step would block on
    # the previous step's completion — a full device round-trip on the
    # critical path. The counter syncs with device state once here (and after
    # resume) and the loop then free-runs, letting step dispatch pipeline.
    step_host = int(state.step)

    # Stall watchdog (cfg.stall_watchdog_s): the axon relay can wedge a
    # client mid-RPC — observed live in the r4 full run as a checkpoint
    # device->host fetch hanging forever while a FRESH client probed the
    # chip fine. A hung main thread can't time itself out, so a daemon
    # thread hard-exits the process when the loop stops beating; the
    # orchestrator (scripts/full_run.py) sees the non-zero exit and resumes
    # from the latest checkpoint. Threshold must exceed legit pauses
    # (remote compiles 30-90 s, first visualize cycle, checkpoint saves).
    # Write-behind host IO (cfg.async_host_io, default on): the val-cycle
    # visualize hook costs ~23 s per 2000 steps at B=60 (batched-sample fetch
    # + 10 SVG rasterizations + TB image writes on a 1-core host) and each
    # checkpoint ~1.4 s — together ~12 ms/step of wall overhead the in-window
    # `time` stat never saw (wall 25.4 vs logged 13.7 ms/step, measured live
    # on the r4 full run). Both now run on single-worker background threads:
    # - visualize gets a device-side COPY of the params (one jitted tree-copy
    #   dispatch, no host transfer) because the train step donates `state` —
    #   the hook must not hold the live buffers; a cycle is skipped if the
    #   previous one is still rendering (no pileup).
    # - checkpointing splits into begin_save (metadata + pack dispatch, on
    #   the critical path — cfg/stats mutate, and packing must see this
    #   step's buffers) and finish_save (fetch + file write) in the worker;
    #   at most one save in flight, errors surface at the next cadence.
    async_io = bool(getattr(cfg, "async_host_io", True)) and not debug
    viz_pool = ckpt_pool = log_pool = None
    viz_fut = {"f": None, "skipped": 0}
    ckpt_fut = {"f": None}
    log_fut = {"f": None}
    if async_io:
        from concurrent.futures import ThreadPoolExecutor

        viz_pool = ThreadPoolExecutor(max_workers=1,
                                      thread_name_prefix="viz")
        ckpt_pool = ThreadPoolExecutor(max_workers=1,
                                       thread_name_prefix="ckpt")
        # log windows: each scalar fetch is a ~30-74 ms relay RPC — 1.5-3.7
        # ms/step of pure wait at log_every=20 if the dispatch loop blocks
        # on it; the single worker preserves print/TB ordering
        log_pool = ThreadPoolExecutor(max_workers=1,
                                      thread_name_prefix="log")
        _copy_tree = jax.jit(
            lambda p: jax.tree_util.tree_map(lambda x: x.copy(), p))
        # compile the copy AND the checkpoint packer now, in setup where
        # slow remote compiles are expected — not as surprise stalls at the
        # first val/ckpt cadence (the packer's first-use compile on the
        # critical path measured ~17 s per early save, r5 stamped segment)
        jax.tree_util.tree_map(lambda x: None, _copy_tree(state.params))
        from .checkpoint import _snapshot_dispatch

        _snapshot_dispatch(state)
        # tighten the GIL handoff: background render/fetch threads hold the
        # GIL up to a full switch interval (default 5 ms) every time the
        # dispatch thread wakes from a relay RPC — at one dispatch per K
        # steps that is real ms/step on this 1-core host
        _old_switch = sys.getswitchinterval()
        sys.setswitchinterval(0.001)

    def _wait_ckpt():
        f, ckpt_fut["f"] = ckpt_fut["f"], None
        if f is not None:
            f.result()  # re-raise background save failures on the main thread

    def _deprioritize():
        # on this 1-core host the background render competes with the
        # dispatch loop for the only core (GIL hands off every ~5 ms, then
        # the OS picks); Linux schedules threads as tasks, so dropping THIS
        # thread's nice to 19 makes the scheduler strongly prefer the
        # dispatch thread (wall 18.3 vs logged 13.7 ms/step measured at
        # B=60 before this, r5)
        try:
            import threading

            os.setpriority(os.PRIO_PROCESS, threading.get_native_id(), 19)
        except Exception:
            pass

    def _ckpt_cycle(ctx):
        _deprioritize()
        finish_save(ctx)
        prune_ckpts(checkpoint_dir, cfg.ckpt_keep_last, cfg.ckpt_keep_every)

    def _viz_cycle(params_copy, step, epoch):
        _deprioritize()
        t0 = time.time()
        try:
            cfg.visualize(model, {"params": params_copy}, train_vars, step,
                          epoch, summary_writer, visualization_dir)
            print(f"[visualize] step {step}: background cycle "
                  f"{time.time() - t0:.1f}s", flush=True)
        except Exception as e:  # never kill training over a render
            print(f"[visualize] background cycle failed at step {step}: "
                  f"{e!r}", flush=True)

    beat = {"t": time.time(), "step": step_host, "done": False}
    if getattr(cfg, "stall_watchdog_s", None):
        import threading

        def _watchdog(limit=float(cfg.stall_watchdog_s)):
            # exits when train() sets beat["done"] (finally below) — a
            # watchdog outliving its run would fire stall_watchdog_s after
            # a SUCCESSFUL return and os._exit(3) the host process (e.g.
            # mid-pytest-suite, or during full_run.py's post-train eval).
            while not beat["done"]:
                time.sleep(min(limit / 4, 30.0))
                if beat["done"]:
                    return
                stale = time.time() - beat["t"]
                if stale > limit:
                    print(f"[watchdog] no loop progress for {stale:.0f}s "
                          f"(last step {beat['step']}) — exiting 3 for the "
                          "orchestrator to resume", flush=True)
                    os._exit(3)

        threading.Thread(target=_watchdog, daemon=True).start()
    try:
        for epoch in epoch_range:
            if done:
                break
            if epoch < first_epoch:
                continue
            print(f"Epoch {epoch + 1}")
            if resident is not None:
                # only the [K, B] int32 icon indices cross the host boundary.
                # Epoch number continues the loader's counter (the init sample
                # batch consumed one iteration) so the shuffle order is IDENTICAL
                # to what the streaming pipeline would deliver.
                resident_epochs += 1
                put_fn = None
                if mesh is not None:
                    from ..parallel.mesh import batch_sharding

                    idx_sharding = batch_sharding(mesh, batch_dim=1)
                    put_fn = lambda b: {  # noqa: E731
                        "idx": jax.device_put(b["idx"], idx_sharding)}
                device_batches = prefetch_to_device(
                    _resident_idx_chunks(loader._epoch + resident_epochs),
                    size=2, num_threads=1, put_fn=put_fn,
                )
            else:
                stack = K if (mesh is None and weights_traceable) or K > 1 else 0
                device_batches = prefetch_to_device(
                    loader, size=2, mesh=mesh, keys=set(model_args),
                    stack_steps=stack,
                )
            for n_iter, batch_model in enumerate(device_batches):
                # budget guard BEFORE dispatching: a resumed run whose budget is
                # already met must not silently train extra steps (the post-run
                # check below only stops AFTER the overshoot executed)
                if ((cfg.num_steps is not None and step_host >= cfg.num_steps)
                        or (max_steps is not None and step_host >= max_steps)):
                    done = True
                    break
                step = step_host + K

                if profile_steps is not None:
                    if step == profile_steps[0]:
                        profile_dir = os.path.join(log_dir, "profile",
                                                   experiment_identifier)
                        os.makedirs(profile_dir, exist_ok=True)
                        jax.profiler.start_trace(profile_dir)
                    elif step == profile_steps[1]:
                        jax.block_until_ready(state.params)
                        jax.profiler.stop_trace()
                        print(f"profiler trace written to {profile_dir}")

                # in-graph-weights paths compute the ramp inside the jitted step;
                # keep the hot loop free of per-step host work (each host-side
                # jnp op / array slice is an extra relay dispatch)
                stacked_res = ((mesh is None and weights_traceable) or K > 1
                               or resident is not None)
                if stacked_res:
                    state, res = step_fn(state, batch_model)
                else:
                    weights = cfg.get_weights(step, epoch)
                    state, res = step_fn(state, batch_model, weights)
                step_host = step
                beat["t"] = time.time()
                beat["step"] = step

                if cfg.num_steps is not None and step > cfg.num_steps:
                    done = True
                    break
                if max_steps is not None and step >= max_steps:
                    done = True

                # Event cadences fire on WINDOW CROSSING (step % every < K), not
                # equality: a resumed step count is generally not a multiple of
                # the new K (e.g. resume at 23000 with K=6 — steps 23006, 23012,
                # ... are never ≡0 mod any K-rounded cadence), and with equality
                # checks logging/val/checkpointing would go silent for the rest
                # of the run while the host free-runs dispatching with no
                # synchronization (observed live in the r4 full run).
                if step % log_every < K:
                    if stacked_res:
                        # res values are [K]-stacked; expose the window's last step
                        res = {k: v[-1] for k, v in res.items()}
                    weights = cfg.get_weights(step, epoch)
                    elapsed = timer.get_elapsed_time() / log_every
                    if log_pool is not None:
                        # res holds FRESH per-step output scalars (not the
                        # donated state), safe for a worker to fetch later;
                        # the wall-time read stays on the loop thread
                        f = log_fut["f"]
                        if f is not None:
                            f.result()  # order + surface worker errors
                        log_fut["f"] = log_pool.submit(
                            _log_cycle, stats, summary_writer, res, weights,
                            lr_schedule(step), elapsed, step, epoch)
                    else:
                        # ONE device->host fetch for all log scalars: each
                        # individual float(x) on a device scalar is a full
                        # relay round trip (~74 ms measured) — per-key
                        # fetches cost more than the whole 20-step window
                        scalar_stats = _fetch_scalar_stats(res, weights,
                                                           lr_schedule(step))
                        scalar_stats["time"] = elapsed
                        stats.update("train", step, epoch, scalar_stats)
                        print(stats.get_summary("train"))
                        stats.write_tensorboard(summary_writer, "train")

                if step % val_every < K:
                    if viz_pool is not None:
                        f = viz_fut["f"]
                        if f is not None and not f.done():
                            viz_fut["skipped"] += 1  # still rendering: skip
                        else:
                            viz_fut["f"] = viz_pool.submit(
                                _viz_cycle, _copy_tree(state.params), step,
                                epoch)
                    else:
                        timer.reset()
                        cfg.visualize(
                            model, {"params": state.params}, train_vars, step,
                            epoch, summary_writer, visualization_dir,
                        )

                if not debug and step % ckpt_every < K:
                    if ckpt_pool is not None:
                        _wait_ckpt()  # at most one save in flight, in order
                        if log_fut["f"] is not None:
                            # the log worker mutates `stats`, which
                            # begin_save serializes — drain it first
                            log_fut["f"].result()
                        ctx = begin_save(checkpoint_dir, state, cfg, stats,
                                         train_vars, step=step)
                        ckpt_fut["f"] = ckpt_pool.submit(_ckpt_cycle, ctx)
                    else:
                        save_ckpt(checkpoint_dir, state, cfg, stats,
                                  train_vars)
                        prune_ckpts(checkpoint_dir, cfg.ckpt_keep_last,
                                    cfg.ckpt_keep_every)

                if done:
                    break

        # drain pending background IO while the watchdog is still armed (a
        # wedged relay mid-fetch must still trip it), then the final save —
        # callers see a fully-written TB/checkpoint tree when train() returns
        if viz_fut["f"] is not None:
            viz_fut["f"].result()
        if log_fut["f"] is not None:
            log_fut["f"].result()
        _wait_ckpt()
        if not debug:
            save_ckpt(checkpoint_dir, state, cfg, stats, train_vars)
        if viz_fut["skipped"]:
            print(f"[visualize] skipped {viz_fut['skipped']} overlapping "
                  "background cycles", flush=True)
    finally:
        # release the watchdog thread: without this it outlives the run
        # and hard-kills the process stall_watchdog_s later (ADVICE r4).
        beat["done"] = True
        if async_io:
            sys.setswitchinterval(_old_switch)
        if viz_pool is not None:
            # non-daemon workers: an in-flight render finishes before the
            # interpreter exits; nothing new can be submitted after this
            viz_pool.shutdown(wait=False)
            ckpt_pool.shutdown(wait=False)
            log_pool.shutdown(wait=False)
    return state, stats


def _log_cycle(stats, summary_writer, res, weights, lr, elapsed, step,
               epoch):
    """Background half of a log window: fetch the scalar pack (one relay
    RPC), update stats, print, write TB. Runs on the single `log` worker so
    output order is preserved and the dispatch loop never waits on the
    fetch."""
    scalar_stats = _fetch_scalar_stats(res, weights, lr)
    scalar_stats["time"] = elapsed
    stats.update("train", step, epoch, scalar_stats)
    print(stats.get_summary("train"), flush=True)
    stats.write_tensorboard(summary_writer, "train")


def _fetch_scalar_stats(res: dict, weights: dict, lr) -> dict:
    """Pull every scalar needed for a log line in ONE device->host transfer:
    stack them into a single f32 vector on device, fetch once, unpack."""
    import jax.numpy as jnp

    items = {}
    for src in (res, weights):
        for k, v in src.items():
            if np.ndim(v) == 0:
                items[k] = v
    keys = list(items)
    stacked = jnp.stack([jnp.float32(items[k]) for k in keys]
                        + [jnp.float32(lr)])
    vals = np.asarray(stacked)
    out = dict(zip(keys, map(float, vals[:-1])))
    out["lr"] = float(vals[-1])
    return out


def _make_summary_writer(path):
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(path)
    except Exception:

        class _Null:
            def add_scalar(self, *a, **k):
                pass

            def add_image(self, *a, **k):
                pass

        return _Null()


def main():
    parser = argparse.ArgumentParser(description="DeepSVG-TPU trainer")
    parser.add_argument("--config-module", type=str, required=True)
    parser.add_argument("--num-devices", type=int, default=None)
    parser.add_argument("--log-dir", type=str, default="./logs")
    parser.add_argument("--debug", action="store_true", default=False)
    parser.add_argument("--resume", action="store_true", default=False)
    parser.add_argument(
        "--profile", type=str, default=None, metavar="START:STOP",
        help="capture a jax.profiler device trace of steps [START, STOP) "
             "into <log-dir>/profile/",
    )
    parser.add_argument(
        "--dataset-module", type=str, default=None,
        help="override cfg.dataloader_module (e.g. deepsvg_tpu.data.synthetic "
             "to train any config without downloaded data)",
    )
    parser.add_argument(
        "--max-steps", type=int, default=None,
        help="stop after this many optimization steps (smoke runs)",
    )
    args = parser.parse_args()

    n_dev = args.num_devices or jax.device_count()
    cfg = load_config(args.config_module, n_dev)
    model_name, experiment_name = args.config_module.split(".")[-2:]
    if args.dataset_module:
        cfg.dataloader_module = args.dataset_module

    profile_steps = None
    if args.profile:
        start, stop = args.profile.split(":")
        profile_steps = (int(start), int(stop))

    set_seed(42)
    enable_compilation_cache()
    train(cfg, model_name, experiment_name, log_dir=args.log_dir,
          debug=args.debug, resume=args.resume, profile_steps=profile_steps,
          max_steps=args.max_steps)


if __name__ == "__main__":
    main()
