"""Round-5: can the dense (bucket64d) 2-round probe cost ONE gather?

bucket64d displaces overflow keys into the NEXT bucket, so a query's
two candidate rows are ADJACENT in HBM.  If a gather with
slice_sizes=(2, W) (one descriptor per query fetching a contiguous 1 KB
window) runs at the same per-row rate as the 512 B single-row gather
measured in PERF.md (18-29 ns/row, descriptor-issue-bound — not
bandwidth-bound: 28 GB/s of 819), the dense layout probes at the SAME
rate as bucket64s while holding 1.76x the keys.

Measures, on an at-scale (>=4.3 GB) table on the current device:
  1-row take        — the bucket64s probe gather (baseline)
  2x 1-row take     — the naive 2-round dense probe (2 descriptors)
  (2,W) window      — lax.gather slice, 1 descriptor, 2 rows
  (1,2W) pairrow    — control: half the indices at twice the width

Usage: python scripts/exp_window_gather.py [nb_bits=23] [Q=4194304]
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
import jax.lax as lax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    np.asarray(out)                      # compile + honest barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    nb_bits = int(sys.argv[1]) if len(sys.argv) > 1 else 23
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 4 * 1024 * 1024
    NB, W = 1 << nb_bits, 128
    rng = np.random.default_rng(0)
    print(f"table {NB}x{W} int32 = {NB * W * 4 / 1e9:.2f} GB, "
          f"Q={Q / 1e6:.1f}M on {jax.devices()[0].platform}", flush=True)

    tab = jnp.asarray(rng.integers(0, 2 ** 31 - 1,
                                   size=(NB + 1, W)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, NB - 1, size=(Q,)).astype(np.int32))

    def one_row(t, i):
        return jnp.take(t, i, axis=0).sum(axis=-1, dtype=jnp.int32).sum()

    def two_rows(t, i):
        a = jnp.take(t, i, axis=0).sum(axis=-1, dtype=jnp.int32)
        b = jnp.take(t, i + 1, axis=0).sum(axis=-1, dtype=jnp.int32)
        return (a + b).sum()

    dn = lax.GatherDimensionNumbers(offset_dims=(1, 2),
                                    collapsed_slice_dims=(),
                                    start_index_map=(0,))

    def window(t, i):
        w = lax.gather(t, i[:, None], dn, slice_sizes=(2, W),
                       mode=lax.GatherScatterMode.CLIP)
        return w.sum(axis=(1, 2), dtype=jnp.int32).sum()

    tab2 = tab[:NB].reshape(NB // 2, 2 * W)
    idx_h = idx[: Q // 2] >> 1

    def pairrow(t, i):
        return jnp.take(t, i, axis=0).sum(axis=-1, dtype=jnp.int32).sum()

    rows = [("1-row 512B take (bucket64s probe)", one_row, (tab, idx), Q),
            ("2x 1-row take (naive dense probe)", two_rows, (tab, idx), Q),
            ("(2,128) window gather, 1 descr", window, (tab, idx), Q),
            ("(1,256) pair-row control, Q/2", pairrow, (tab2, idx_h), Q // 2)]
    out = {}
    for name, fn, args, q in rows:
        f = jax.jit(fn)
        dt = timeit(name, f, *args)
        out[name] = dt
        print(f"{name:38s} {dt * 1e3:8.2f} ms  "
              f"{q / dt / 1e6:7.1f} M queries/s  "
              f"{dt / q * 1e9:6.2f} ns/query", flush=True)
    r1, r2, rw = (out[rows[0][0]], out[rows[1][0]], out[rows[2][0]])
    print(f"\nwindow vs 1-row: {rw / r1:.2f}x cost; "
          f"window vs 2-row: {rw / r2:.2f}x; "
          f"{'WINDOW WINS' if rw < 0.75 * r2 else 'window ~ 2-row'}")


if __name__ == "__main__":
    main()
