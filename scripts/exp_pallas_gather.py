"""Experiment: can Mosaic lower a VMEM dynamic gather (jnp.take) inside a
Pallas TPU kernel, and how fast is it vs the XLA HBM gather?

Tries three inner-gather idioms on the current backend and times the
winner against jnp.take from HBM at probe-like shapes.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_kernel(name, make_fn, *args):
    try:
        out = make_fn(*args)
        out = np.asarray(out)
        print(f"{name}: OK, sample {out.reshape(-1)[:4]}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


def main():
    S, Q = 8192, 4096
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 100, size=(S,)).astype(np.int32))
    table2d = jnp.asarray(rng.integers(0, 100, size=(S, 128)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, S, size=(Q,)).astype(np.int32))
    idx2d = jnp.asarray(rng.integers(0, S, size=(Q // 128, 128)).astype(np.int32))

    # idiom 1: 1-D jnp.take inside kernel (VMEM operand)
    def k1(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    def f1(table, idx):
        return pl.pallas_call(
            k1,
            out_shape=jax.ShapeDtypeStruct((Q,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    try_kernel("1d take", jax.jit(f1), table, idx)

    # idiom 2: per-lane take_along_axis (sublane gather)
    def k2(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    def f2(table2d, idx2d):
        return pl.pallas_call(
            k2,
            out_shape=jax.ShapeDtypeStruct(idx2d.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table2d, idx2d)

    try_kernel("take_along_axis sublane", jax.jit(f2), table2d, idx2d)

    # idiom 3: 2d reshaped operand, 1d indices -> per-lane after div/mod
    def k3(tab_ref, idx_ref, out_ref):
        i = idx_ref[:]
        rows = i >> 7
        out = jnp.take_along_axis(tab_ref[:], rows, axis=0)
        out_ref[:] = out

    def f3(table2d, idx2d):
        return pl.pallas_call(
            k3,
            out_shape=jax.ShapeDtypeStruct(idx2d.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table2d, idx2d)

    try_kernel("shifted sublane gather", jax.jit(f3), table2d, idx2d)


if __name__ == "__main__":
    main()
