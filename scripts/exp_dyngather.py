"""Measure raw tpu.dynamic_gather throughput inside a Pallas kernel.

The supported form (jax lowering): jnp.take_along_axis(x, idx, axis)
with x.shape == idx.shape on 2-D VMEM operands — axis 0 gathers within
each lane, axis 1 shuffles within each row. If this runs at VPU-like
rates (>1G elem/s) a lane-sharded probe kernel can beat the ~72M rows/s
XLA HBM gather; if not, the gather wall stands.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, secs=2.0):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < secs:
        np.asarray(fn(*args))
        reps += 1
    return (time.perf_counter() - t0) / reps


def make(axis, S, repeat):
    def kernel(x_ref, idx_ref, out_ref):
        x = x_ref[:]
        idx = idx_ref[:]
        acc = jnp.zeros_like(x)
        for _ in range(repeat):
            g = jnp.take_along_axis(x, idx, axis=axis)
            acc = acc + g
            idx = (idx + 1) % x.shape[axis]
        out_ref[:] = acc

    def fn(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
    return jax.jit(fn)


def main():
    rng = np.random.default_rng(0)
    S = 4096
    x = jax.device_put(rng.integers(0, 1 << 30, (S, 128)).astype(np.int32))
    for axis in (0, 1):
        hi = S if axis == 0 else 128
        idx = jax.device_put(rng.integers(0, hi, (S, 128)).astype(np.int32))
        for repeat in (1, 16, 64):
            try:
                f = make(axis, S, repeat)
                t = timeit(f, x, idx)
                n = S * 128 * repeat
                print(f"dynamic_gather axis={axis} repeat={repeat}: "
                      f"{t*1e3:8.3f} ms ({n/t/1e9:6.2f} G elem/s)", flush=True)
            except Exception as e:
                print(f"axis={axis} repeat={repeat}: FAIL "
                      f"{type(e).__name__}: {str(e).splitlines()[0][:120]}",
                      flush=True)
                break


if __name__ == "__main__":
    main()
