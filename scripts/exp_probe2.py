"""Round-2 probe microbenchmarks on the real chip.

Measures the raw row-gather wall at the exact shapes the fused pipeline
uses, isolates the probe/agg stage costs, and re-tests the Pallas
dynamic_gather availability (round 1 found the backend rejects it; the
backend may have matured).

Run: python scripts/exp_probe2.py
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, secs=3.0):
    r = np.asarray(fn(*args))  # compile + warm; host materialization = sync
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < secs:
        r = fn(*args)
        np.asarray(r)
        reps += 1
    return (time.perf_counter() - t0) / reps


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    NB = 524288
    Q = 16384 * 12 * 26  # ~ the fused pipeline's query count per batch

    idx = jnp.asarray(rng.integers(0, NB, Q, dtype=np.int64).astype(np.int32))
    for width in (8, 16, 32):
        rows = jnp.asarray(
            rng.integers(-2**31, 2**31 - 1, (NB * 32 // width, width),
                         dtype=np.int64).astype(np.int32))
        f = jax.jit(lambda r, i: jnp.take(r, i % r.shape[0], axis=0).sum())
        dt = timeit(f, rows, idx)
        print(f"take rows width={width:3d} ({width*4:4d}B): "
              f"{dt*1e3:8.2f} ms  {Q/dt/1e6:7.1f} M rows/s")

    # sorted indices
    sidx = jnp.sort(idx)
    rows = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (NB, 32),
                                    dtype=np.int64).astype(np.int32))
    f = jax.jit(lambda r, i: jnp.take(r, i, axis=0).sum())
    print(f"take rows sorted idx:        {timeit(f, rows, sidx)*1e3:8.2f} ms")

    # gather via one_hot matmul at small table (sanity, should lose)
    # ... skipped: table far too large.

    # dynamic_gather availability probe (Pallas)
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        S, L = 512, 128

        def kern(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

        tab = jnp.asarray(rng.integers(0, 100, (S, L), dtype=np.int64)
                          .astype(np.int32))
        gidx = jnp.asarray(rng.integers(0, S, (S, L), dtype=np.int64)
                           .astype(np.int32))
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, gidx)
        np.asarray(out)
        ref = np.take_along_axis(np.asarray(tab), np.asarray(gidx), axis=0)
        ok = np.array_equal(np.asarray(out), ref)
        print("pallas dynamic_gather axis0 (512x128): COMPILES, correct =", ok)
        if ok:
            dt = timeit(lambda t, i: pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t, i).sum(), tab, gidx)
            print(f"  rate: {S*L/dt/1e6:.1f} M elem/s ({dt*1e3:.3f} ms)")
    except Exception as e:  # noqa: BLE001
        print("pallas dynamic_gather axis0: FAILS:",
              str(e).split(chr(10))[0][:200])

    # bigger dynamic_gather (closer to useful size)
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        S, L = 4096, 128

        def kern2(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

        tab = jnp.asarray(rng.integers(0, 100, (S, L), dtype=np.int64)
                          .astype(np.int32))
        gidx = jnp.asarray(rng.integers(0, S, (S, L), dtype=np.int64)
                           .astype(np.int32))
        out = pl.pallas_call(
            kern2,
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, gidx)
        ref = np.take_along_axis(np.asarray(tab), np.asarray(gidx), axis=0)
        print("pallas dynamic_gather axis0 (4096x128): COMPILES, correct =",
              np.array_equal(np.asarray(out), ref))
    except Exception as e:  # noqa: BLE001
        print("pallas dynamic_gather axis0 4096x128: FAILS:",
              str(e).split(chr(10))[0][:200])


if __name__ == "__main__":
    main()
