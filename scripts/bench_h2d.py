"""Measure host->device transfer cost through the remote relay, and whether
transfers overlap with device compute.

Questions this answers (driving the e2e train-loop design):
1. What is device_put bandwidth for train-batch-sized buffers (~1.6 MB)?
2. Does a device_put issued while a long jitted computation runs overlap
   (true async DMA) or serialize behind it (single relay stream)?
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # --- 1. device_put bandwidth, batch-sized buffers
    sizes_mb = [0.1, 0.4, 1.6, 6.4, 12.8]
    for mb in sizes_mb:
        n = int(mb * 1e6 // 2)
        host = np.arange(n, dtype=np.int16)
        # warm up
        jnp.sum(jax.device_put(host)).block_until_ready()
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            d = jax.device_put(host)
        # force completion: reduce to scalar and fetch
        float(jnp.sum(d))
        dt = (time.perf_counter() - t0) / reps
        print(f"device_put {mb:5.1f} MB: {dt*1e3:7.2f} ms  "
              f"({mb/dt:6.1f} MB/s)")

    # --- 2. overlap: long matmul chain vs concurrent device_put
    a = jnp.asarray(np.random.default_rng(0).normal(size=(4096, 4096)),
                    dtype=jnp.bfloat16)

    @jax.jit
    def burn(a, n):
        def body(x, _):
            return x @ a * (1.0 / 64.0), None
        y, _ = jax.lax.scan(body, a, None, length=n)
        return jnp.float32(y.sum())

    n_burn = 60
    float(burn(a, n_burn))  # warm/compile
    t0 = time.perf_counter()
    float(burn(a, n_burn))
    t_burn = time.perf_counter() - t0
    print(f"burn alone: {t_burn*1e3:.1f} ms")

    host = np.arange(int(1.6e6 // 2), dtype=np.int16)
    t0 = time.perf_counter()
    fut = burn(a, n_burn)          # async dispatch
    puts = [jax.device_put(host) for _ in range(8)]
    t_put_issue = time.perf_counter() - t0
    float(fut)
    for p in puts:
        p.block_until_ready()
    t_total = time.perf_counter() - t0
    print(f"burn + 8x 1.6MB device_put concurrent: total {t_total*1e3:.1f} ms "
          f"(puts issued in {t_put_issue*1e3:.1f} ms)")
    print("=> overlap" if t_total < t_burn * 1.3 else "=> serialized")


if __name__ == "__main__":
    main()
