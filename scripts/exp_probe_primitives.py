"""Measure the primitives a faster probe could be built from.

(a) XLA sort of probe-count u32 keys (routing via sort?)
(b) Pallas tpu.dynamic_gather: operand (S,128), indices (S,128),
    out[i,l] = op[idx[i,l], l] — the in-VMEM gather unit.
(c) Streamed-tile loop: grid over table tiles, auto-pipelined
    HBM->VMEM, dynamic_gather per tile (lane-replicated layout).
(d) XLA gather with iota indices (is the wall locality-sensitive?)

Usage: python scripts/exp_probe_primitives.py
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:8.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    Q = 1_228_800

    # (a) sort u32 keys, and key+payload pairs
    keys = jnp.asarray(rng.integers(0, 2**31 - 1, size=(Q,)).astype(np.int32))
    pay = jnp.asarray(np.arange(Q, dtype=np.int32))
    f = jax.jit(lambda k: jax.lax.sort(k))
    timeit("(a) sort u32 keys", f, keys)
    f2 = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
    timeit("(a) sort (key,payload)", f2, keys, pay)

    # (b) dynamic_gather in pallas: one call, out==idx shape==(S,128)
    for S in (512, 2048, 8192):
        tab = jnp.asarray(
            rng.integers(0, 2**31 - 1, size=(S, 128)).astype(np.int32))
        idx = jnp.asarray(
            rng.integers(0, S, size=(S, 128)).astype(np.int32))

        def k(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

        def f3(tab, idx):
            return pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tab, idx)

        try:
            fj = jax.jit(f3)
            out = np.asarray(fj(tab, idx))
            ok = (out == np.asarray(tab)[np.asarray(idx),
                                         np.arange(128)[None, :]]).all()
            dt = timeit(f"(b) dyn_gather S={S:5d} ({S*128} vals)", fj, tab, idx)
            print(f"    correct={ok}  -> {S*128/dt/1e6:9.1f} M vals/s")
        except Exception as e:
            print(f"(b) S={S}: FAIL {type(e).__name__}: {str(e)[:120]}")

    # (c) streamed tiles: grid over T tiles of (512,128) table,
    # fixed (512,128) query-index block per tile, dyn_gather each.
    T = 64
    S = 512
    tabT = jnp.asarray(
        rng.integers(0, 2**31 - 1, size=(T * S, 128)).astype(np.int32))
    idxT = jnp.asarray(rng.integers(0, S, size=(T * S, 128)).astype(np.int32))

    def kt(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    def f4(tab, idx):
        return pl.pallas_call(
            kt,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((S, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T * S, 128), jnp.int32),
        )(tab, idx)

    try:
        fj = jax.jit(f4)
        np.asarray(fj(tabT, idxT))
        dt = timeit(f"(c) streamed {T} tiles dyn_gather", fj, tabT, idxT)
        gb = (T * S * 128 * 4 * 3) / 1e9
        print(f"    -> {T*S*128/dt/1e6:9.1f} M vals/s, {gb/dt:7.1f} GB/s")
    except Exception as e:
        print(f"(c) FAIL {type(e).__name__}: {str(e)[:120]}")

    # (d) XLA gather, iota vs random indices (locality sensitivity)
    NB = 1 << 18
    tab = jnp.asarray(rng.integers(0, 2**31 - 1, size=(NB, 16)).astype(np.int32))
    ridx = jnp.asarray(rng.integers(0, NB, size=(Q,)).astype(np.int32))
    sidx = jnp.asarray((np.arange(Q, dtype=np.int64) % NB).astype(np.int32))
    f5 = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(-1))
    timeit("(d) XLA gather random idx", f5, tab, ridx)
    timeit("(d) XLA gather sequential idx", f5, tab, sidx)


if __name__ == "__main__":
    main()
