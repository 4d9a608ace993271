"""Quick TPU-relay liveness probe.

The axon relay can go UNAVAILABLE for long stretches (docs/NOTES.md).
This probe runs one tiny computation with a hard wall-clock budget and
exits 0 iff the chip answered. Run under `timeout` from the shell as a
second line of defence (backend init can hang before Python signals).
"""
import sys
import time

t0 = time.time()
try:
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    x = jnp.ones((8, 8))
    y = (x @ x).sum()
    y.block_until_ready()
    print(f"OK {devs[0].platform} {len(devs)} dev(s) in {time.time()-t0:.1f}s")
    sys.exit(0)
except Exception as e:  # noqa: BLE001 - report any backend failure
    print(f"DOWN after {time.time()-t0:.1f}s: {type(e).__name__}: {e}")
    sys.exit(1)
