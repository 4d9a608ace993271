"""Batch loader: shuffled epochs, worker threads, host->device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` (train.py:27) with a
framework-owned numpy pipeline: items are packed on CPU worker threads, stacked
into fixed-shape batches, and (optionally) asynchronously staged onto the
device/mesh so that the TPU never waits on the host (HBM-feeding discipline).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


def collate(items: list[dict]) -> dict:
    """Stack a list of per-item dicts into one batch dict of arrays."""
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if vals[0] is None:
            continue
        out[k] = np.stack([np.asarray(v) for v in vals])
    return out


# Wire format: every model input is small-integer-valued (commands 0..6,
# quantized args -1..255, labels), so the host->device transfer — the
# dominant per-step host cost through a remote TPU relay, and real DCN/PCIe
# bandwidth on any pod — ships narrow integers. ``decompress_batch`` (jnp,
# called INSIDE the jitted step, ops fused by XLA) restores the canonical
# dtypes. int16 covers the 257-value arg alphabet exactly; commands fit int8.
_WIRE_DTYPES = {
    "commands": np.int8,
    "commands_grouped": np.int8,
    "args": np.int16,
    "args_grouped": np.int16,
    "args_rel": np.int16,
    "args_rel_grouped": np.int16,
    "filling": np.int8,
}

# Absolute args are {-1} ∪ [0, 255]: 257 values, one too many for uint8 — but
# the -1s carry no information. They sit exactly where CMD_ARGS_MASK[cmd] is 0
# (unused arg slots per command + EOS/SOS/pad rows, whose masks are all-zero),
# so when the matching commands tensor rides in the same batch the -1s can be
# reconstructed ON DEVICE and the wire ships pure uint8 — the dominant payload
# halves again. (Relative args span [0, 510] after the +255 shift; they keep
# int16.)
_MASKED_ARGS_WIRE = {"args": "commands", "args_grouped": "commands_grouped"}


def compress_batch(batch: dict) -> dict:
    """Cast batch entries to the narrow wire dtypes (exact: all values are
    whole numbers in range). Keys not in the table pass through."""
    out = {}
    for k, v in batch.items():
        ck = _MASKED_ARGS_WIRE.get(k)
        if ck is not None and ck in batch:
            # already on the wire (e.g. a corpus materialized straight into
            # wire dtypes): skip the multi-GB copy
            out[k] = (v if v.dtype == np.uint8
                      else np.maximum(v, 0).astype(np.uint8))
            continue
        w = _WIRE_DTYPES.get(k)
        out[k] = v.astype(w) if (w is not None and v.dtype != w) else v
    return out


def decompress_batch(batch: dict) -> dict:
    """Restore canonical dtypes on device (int32 commands/labels, float32
    args; uint8 masked-args wire gets its -1s rebuilt from CMD_ARGS_MASK).
    No-op for entries already canonical, so it is safe to apply
    unconditionally inside the train/eval step."""
    import jax.numpy as jnp

    from ..svgtensor.constants import CMD_ARGS_MASK_NP

    out = {}
    for k, v in batch.items():
        if k.startswith("commands") and v.dtype != jnp.int32:
            out[k] = v.astype(jnp.int32)
        else:
            out[k] = v
    for k, v in batch.items():
        if not k.startswith("args") or not jnp.issubdtype(v.dtype, jnp.integer):
            continue
        if v.dtype == jnp.uint8:
            mask = jnp.asarray(CMD_ARGS_MASK_NP, jnp.bool_)[out[_MASKED_ARGS_WIRE[k]]]
            out[k] = jnp.where(mask, v.astype(jnp.float32), -1.0)
        else:
            out[k] = v.astype(jnp.float32)
    return out


_PROC_DATASET = None


def _proc_init(pickled_dataset):
    """Pool initializer: unpickle the dataset once per worker process."""
    global _PROC_DATASET
    import pickle

    _PROC_DATASET = pickle.loads(pickled_dataset)


def _proc_collate(indices):
    return collate([_PROC_DATASET[int(i)] for i in indices])


class DataLoader:
    """Minimal epoch iterator: shuffle, batch, drop_last, worker prefetch.

    ``worker_mode``:
      - ``"thread"`` (default): GIL-shared workers — right for pre-tensorized
        datasets whose packing is numpy (releases the GIL).
      - ``"process"``: a spawn-context process pool — right for the raw-SVG
        path, whose per-item parse + Schneider fitting is pure-Python CPU
        work that threads serialize on (the reference likewise uses
        DataLoader worker PROCESSES, deepsvg/train.py:27). The dataset is
        pickled to each worker once at pool start.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 4,
                 prefetch: int = 4, seed: int = 0,
                 worker_mode: str = "thread"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.seed = seed
        self.worker_mode = worker_mode
        self._epoch = 0
        self._pool = None

    def _get_pool(self):
        if self._pool is None:
            import multiprocessing as mp
            import pickle

            ctx = mp.get_context("spawn")
            self._pool = ctx.Pool(
                self.num_workers, initializer=_proc_init,
                initargs=(pickle.dumps(self.dataset),),
            )
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None

    def __del__(self):  # pragma: no cover - interpreter teardown best effort
        try:
            self.close()
        except Exception:
            pass

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        batches = [
            idx[i : i + self.batch_size] for i in range(0, n, self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        batches = self._index_batches()
        # columnar fast path: a dataset that can serve a whole batch as one
        # fancy-index per key (e.g. SyntheticIconDataset) skips the per-item
        # Python collate entirely — C-level slicing is ~20x cheaper and, on a
        # single-stream relay host, keeps the GIL off the dispatch thread
        fast = getattr(self.dataset, "get_batch_arrays", None)
        if fast is not None:
            for b in batches:
                yield fast(b)
            return
        if self.num_workers <= 1:
            for b in batches:
                yield collate([self.dataset[int(i)] for i in b])
            return

        if self.worker_mode == "process":
            pool = self._get_pool()
            # imap keeps order and streams results; chunksize 1 so each batch
            # is one task (a batch is already a coarse unit of work)
            yield from pool.imap(_proc_collate, batches, chunksize=1)
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        batch_iter = iter(batches)
        lock = threading.Lock()
        n_batches = len(batches)
        _SENTINEL = object()

        # ordered output: workers claim (slot, indices) and a single
        # reordering consumer yields in sequence
        results: dict[int, dict] = {}
        results_cv = threading.Condition()
        claimed = iter(enumerate(batches))

        def worker():
            while True:
                with lock:
                    nxt = next(claimed, None)
                if nxt is None:
                    return
                slot, b = nxt
                batch = collate([self.dataset[int(i)] for i in b])
                with results_cv:
                    results[slot] = batch
                    results_cv.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        for slot in range(n_batches):
            # pop under the lock, yield OUTSIDE it: this generator may be
            # consumed from multiple threads (prefetch_to_device stagers take
            # turns calling next() under their claim lock), and a yield inside
            # `with results_cv` would suspend while holding the lock in one
            # thread and resume — and try to release it — in another
            with results_cv:
                while slot not in results:
                    results_cv.wait()
                batch = results.pop(slot)
            yield batch


def device_put_sharded(batch: dict, mesh=None, batch_dim: int = 0):
    """Move a host batch onto the device (or sharded over a mesh).
    ``batch_dim=1`` for step-stacked ``[K, B, ...]`` batches."""
    import jax

    if mesh is None:
        return jax.tree.map(jax.device_put, batch)
    from ..parallel.mesh import shard_batch

    return shard_batch(batch, mesh, batch_dim=batch_dim)


def prefetch_to_device(iterator, size: int = 2, mesh=None, keys=None,
                       stack_steps: int = 0, num_threads: int = 3,
                       put_fn=None):
    """Stage upcoming host batches onto the device(s) ahead of consumption.

    Staging runs on BACKGROUND threads: through a remote TPU relay,
    ``jax.device_put`` can block on an RPC round trip (latency, not
    bandwidth), so staging inline between yields would put that latency back
    on the critical path every step — exactly what this prefetch exists to
    hide. One thread is not enough once the device step is shorter than that
    round trip (~30 ms measured): a single stager serializes its puts and the
    loop throttles to the RPC latency. ``num_threads`` stagers each claim the
    next (slot, host batch) under a lock and put concurrently — the RPCs
    pipeline — while a slot-ordered hand-off preserves exact batch order
    (batch-order determinism is part of the reference-parity contract).
    The queue keeps ``size`` staged batches per thread ahead of the loop."""
    import os
    import queue as _queue
    import threading

    num_threads = int(os.environ.get("DEEPSVG_TPU_STAGER_THREADS",
                                     num_threads))
    _END = object()

    def _host_batches():
        pend = []
        for batch in iterator:
            if keys is not None:
                batch = {k: v for k, v in batch.items() if k in keys}
            batch = compress_batch(batch)
            if stack_steps < 1:  # 0: plain per-step batches
                yield batch, 0
                continue
            # multi-step dispatch: stack K host batches -> one [K, ...]
            # device array per key (feeds trainer.jit_train_multi_step);
            # a ragged tail is dropped like drop_last
            pend.append(batch)
            if len(pend) == stack_steps:
                stacked = {k: np.stack([b[k] for b in pend]) for k in pend[0]}
                pend = []
                yield stacked, 1

    host_iter = _host_batches()
    claim_lock = threading.Lock()
    slot_counter = [0]
    results: dict[int, object] = {}
    results_cv = threading.Condition()
    # bound how far stagers run ahead: at most size*num_threads staged
    # batches (device arrays pin HBM) beyond what the loop has consumed
    budget = threading.Semaphore(max(size, 1) * max(num_threads, 1))
    n_live = [max(num_threads, 1)]

    stop = [False]

    def stager():
        try:
            while True:
                budget.acquire()
                if stop[0]:
                    return
                with claim_lock:
                    try:
                        nxt = next(host_iter, None)
                    except BaseException as e:  # host-side batch prep failed
                        nxt = _StagerError(e)
                    if nxt is None:
                        return
                    slot = slot_counter[0]
                    slot_counter[0] += 1
                if isinstance(nxt, _StagerError):
                    staged = nxt
                else:
                    batch, batch_dim = nxt
                    try:
                        if put_fn is not None:
                            staged = put_fn(batch)
                        else:
                            staged = device_put_sharded(batch, mesh,
                                                        batch_dim=batch_dim)
                    except BaseException as e:  # surface in the consumer
                        staged = _StagerError(e)
                with results_cv:
                    results[slot] = staged
                    results_cv.notify_all()
                if isinstance(staged, _StagerError):
                    return
        finally:
            with results_cv:
                n_live[0] -= 1
                results_cv.notify_all()

    threads = [threading.Thread(target=stager, daemon=True)
               for _ in range(max(num_threads, 1))]
    for t in threads:
        t.start()

    slot = 0
    try:
        while True:
            with results_cv:
                while slot not in results:
                    if n_live[0] == 0 and slot >= slot_counter[0]:
                        return  # host iterator exhausted; all slots delivered
                    results_cv.wait(timeout=1.0)
                out = results.pop(slot)
            budget.release()
            slot += 1
            if isinstance(out, _StagerError):
                raise out.exc
            yield out
    finally:
        # consumer done or abandoned mid-epoch (train() breaks on step
        # budgets): unblock any stager parked on the budget so the threads
        # exit instead of leaking with staged device arrays pinned
        stop[0] = True
        for _ in threads:
            budget.release()


class _StagerError:
    """Marker carrying an exception out of a stager thread."""

    def __init__(self, exc: BaseException):
        self.exc = exc
