"""Gather cost vs row width on the current device.

The probe is one HBM row gather per query; this measures jnp.take
throughput at probe-like query counts for several row widths and
index layouts, to pick the table layout that minimizes probe time.

Usage: python scripts/profile_gather_width.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    Q = 1_228_800  # ~bench probe count (4096 pairs x 2 x 6 x 25)
    NB = 1 << 18   # 262k buckets

    idx = jnp.asarray(rng.integers(0, NB, size=(Q,)).astype(np.int32))
    idx2d = idx.reshape(-1, 128)

    for w in (1, 2, 4, 8, 16, 32):
        tab = jnp.asarray(
            rng.integers(0, 2**31 - 1, size=(NB, w)).astype(np.int32))

        def take_rows(t, i):
            return jnp.take(t, i, axis=0).sum(axis=-1)

        f = jax.jit(take_rows)
        dt = timeit(f"take rows w={w:3d} ({4*w:4d}B)", f, tab, idx)
        print(f"   -> {Q/dt/1e6:8.1f} M rows/s, {Q*4*w/dt/1e9:7.1f} GB/s")

    # flat 1-D gather (single int32 per query)
    tabf = jnp.asarray(rng.integers(0, 2**31 - 1, size=(NB * 32,)).astype(np.int32))
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    dt = timeit("take flat 1d x1", f, tabf, idx)
    print(f"   -> {Q/dt/1e6:8.1f} M elems/s")

    # 2d queries, take_along_axis style: table (NB,128), per-query one row
    tab128 = jnp.asarray(rng.integers(0, 2**31 - 1, size=(NB, 128)).astype(np.int32))
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0)[..., ::8].sum(axis=-1))
    dt = timeit("take rows w=128, use 16", f, tab128, idx)
    print(f"   -> {Q/dt/1e6:8.1f} M rows/s")


if __name__ == "__main__":
    main()
