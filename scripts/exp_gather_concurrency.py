"""Do independent XLA gathers pipeline on this device?

The probe is bound by the gather unit's per-row cost (~60-100M rows/s,
width-insensitive; see profile_gather_width.py). The fused cuckoo probe
issues 2 independent gathers and beats the single-gather rate, so the
unit may pipeline concurrent gathers. This measures k-way splits, query
-count scaling, and dtype effects to find the achievable probe ceiling.

Usage: python scripts/exp_gather_concurrency.py
"""

import os

import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=20, rows=None):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    dt = (time.perf_counter() - t0) / iters
    extra = f"  {rows/dt/1e6:8.1f} M rows/s" if rows else ""
    print(f"{name:46s} {dt*1e3:8.2f} ms{extra}")
    return dt


def main():
    rng = np.random.default_rng(0)
    NB = 1 << 21  # 2M buckets (bench-table scale)
    W = 2

    tab = jnp.asarray(rng.integers(0, 2**31 - 1, size=(NB, W)).astype(np.int32))

    for Q in (307_200, 1_228_800, 4_915_200):
        idx = jnp.asarray(rng.integers(0, NB, size=(Q,)).astype(np.int32))
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(-1))
        timeit(f"1 take of Q={Q}", f, tab, idx, rows=Q)

    Q = 1_228_800
    idx = jnp.asarray(rng.integers(0, NB, size=(Q,)).astype(np.int32))

    # k-way split of the SAME total row count
    for k in (2, 4, 8):
        parts = [idx[i * (Q // k):(i + 1) * (Q // k)] for i in range(k)]

        def fk(t, *ps):
            return [jnp.take(t, p, axis=0).sum(-1) for p in ps]

        f = jax.jit(fk)
        timeit(f"{k} takes of Q/{k} (same total)", f, tab, *parts, rows=Q)

    # 2 full-size independent takes (cuckoo-like): 2Q rows total
    idx2 = jnp.asarray(rng.integers(0, NB, size=(Q,)).astype(np.int32))

    def f2(t, a, b):
        return jnp.take(t, a, axis=0).sum(-1), jnp.take(t, b, axis=0).sum(-1)

    timeit("2 takes of Q each (2Q rows)", jax.jit(f2), tab, idx, idx2,
           rows=2 * Q)

    # serial dependency: 2 chained takes of Q (forces no overlap)
    def fchain(t, a):
        v = jnp.take(t, a, axis=0).sum(-1)
        b = (a + (v & 1)) & (NB - 1)
        return jnp.take(t, b, axis=0).sum(-1)

    timeit("2 chained takes of Q (2Q rows)", jax.jit(fchain), tab, idx,
           rows=2 * Q)

    # dtype: int8 rows / uint16 rows
    tab8 = jnp.asarray(rng.integers(0, 127, size=(NB, 8)).astype(np.int8))
    f8 = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(-1))
    timeit("1 take int8 rows w=8", f8, tab8, idx, rows=Q)

    # 2D index shape (does layout of the index vector matter?)
    idx2d = idx.reshape(-1, 128)
    f2d = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(-1))
    timeit("1 take idx shaped (Q/128,128)", f2d, tab, idx2d, rows=Q)

    # smaller table: is the rate table-size sensitive (TLB/row setup)?
    for nb_small in (1 << 12, 1 << 16, 1 << 18):
        tsm = jnp.asarray(
            rng.integers(0, 2**31 - 1, size=(nb_small, W)).astype(np.int32))
        ism = jnp.asarray(rng.integers(0, nb_small, size=(Q,)).astype(np.int32))
        fs = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(-1))
        timeit(f"1 take from {nb_small}-row table", fs, tsm, ism, rows=Q)


if __name__ == "__main__":
    main()
