"""Does an overlapping-slice lax.gather (slice_sizes=(16,2)) run at the
same per-row rate as jnp.take of preformed rows? Development tool."""

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
from jax import lax

ITERS = 16


def timeit(fn, *args):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.default_rng(0)
    nb = 524_288
    bucket = 8
    cap = nb * bucket
    flat = jnp.asarray(rng.integers(0, 100, size=(cap + bucket, 2)).astype(np.int32))
    rows16 = jnp.asarray(rng.integers(0, 100, size=(nb, 16)).astype(np.int32))
    rows32 = jnp.asarray(rng.integers(0, 100, size=(nb, 32)).astype(np.int32))

    B, Q = 4096, 312
    qb = rng.integers(0, nb, size=(B, Q)).astype(np.int32)
    qb_j = jnp.asarray(qb)

    @jax.jit
    def take16(rows, q):
        r = jnp.take(rows, q, axis=0)
        return r.sum(-1).astype(jnp.int32).sum(-1)

    @jax.jit
    def gather_overlap(flat, q):
        # start = q*bucket, slice (2*bucket, 2) from (cap+bucket, 2)
        starts = (q * bucket).reshape(-1)[:, None]  # (N, 1)
        out = lax.gather(
            flat,
            jnp.concatenate([starts, jnp.zeros_like(starts)], axis=1),
            lax.GatherDimensionNumbers(
                offset_dims=(1, 2),
                collapsed_slice_dims=(),
                start_index_map=(0, 1),
            ),
            slice_sizes=(2 * bucket, 2),
        )  # (N, 16, 2)
        return out.sum((1, 2)).astype(jnp.int32).reshape(q.shape).sum(-1)

    @jax.jit
    def gather_overlap_flat1d(flat1d, q):
        # flat (2(cap+bucket),) int32, start = q*2*bucket, slice (32,)
        starts = (q * (2 * bucket)).reshape(-1)[:, None]
        out = lax.gather(
            flat1d,
            starts,
            lax.GatherDimensionNumbers(
                offset_dims=(1,),
                collapsed_slice_dims=(),
                start_index_map=(0,),
            ),
            slice_sizes=(4 * bucket,),
        )
        return out.sum(1).astype(jnp.int32).reshape(q.shape).sum(-1)

    t = timeit(take16, rows16, qb_j)
    print(f"take rows16           {t*1e3:8.2f} ms  {t/qb.size*1e9:6.2f} ns/row")
    t = timeit(take16, rows32, qb_j)
    print(f"take rows32           {t*1e3:8.2f} ms  {t/qb.size*1e9:6.2f} ns/row")
    t = timeit(gather_overlap, flat, qb_j)
    print(f"gather overlap (16,2) {t*1e3:8.2f} ms  {t/qb.size*1e9:6.2f} ns/row")
    flat1d = jnp.asarray(
        rng.integers(0, 100, size=2 * (cap + bucket)).astype(np.int32))
    t = timeit(gather_overlap_flat1d, flat1d, qb_j)
    print(f"gather overlap (32,)  {t*1e3:8.2f} ms  {t/qb.size*1e9:6.2f} ns/row")


if __name__ == "__main__":
    main()
