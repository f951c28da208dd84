"""Gather microbenchmarks: cost vs index count, row width, table size,
index layout. Development tool."""

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

ITERS = 16


def timeit(fn, *args):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / ITERS


def bench(name, rows, q, reduce_last=True):
    @jax.jit
    def f(rows, q):
        r = jnp.take(rows, q, axis=0)
        if r.ndim > q.ndim:
            r = r.sum(axis=-1)
        return r.astype(jnp.int32).sum(axis=-1) if r.ndim > 1 else r.astype(jnp.int32)

    t = timeit(f, rows, q)
    n = q.size
    print(f"{name:44s} {t*1e3:8.2f} ms  {t/n*1e9:7.2f} ns/row")


def main():
    rng = np.random.default_rng(0)
    M = 8_388_608
    flat = jnp.asarray(rng.integers(0, 100, size=M).astype(np.int32))
    rows2 = jnp.asarray(rng.integers(0, 100, size=(M, 2)).astype(np.int32))
    rows8 = jnp.asarray(rng.integers(0, 100, size=(M // 4, 8)).astype(np.int32))
    rows21 = jnp.asarray(rng.integers(0, 100, size=(20_000, 21)).astype(np.int32))
    rows128 = jnp.asarray(rng.integers(0, 100, size=(20_000, 128)).astype(np.int32))
    small_flat = jnp.asarray(rng.integers(0, 100, size=20_000).astype(np.int32))

    N = 1_277_952
    q1 = jnp.asarray(rng.integers(0, M, size=N).astype(np.int32))
    q2d = q1.reshape(4096, -1)
    qs = jnp.asarray(np.sort(rng.integers(0, M, size=N)).astype(np.int32))
    q_small = jnp.asarray(rng.integers(0, 20_000, size=524_288).astype(np.int32))
    q_small2d = q_small.reshape(4096, 128)

    bench("flat (M,) x 1.28M flat idx", flat, q1)
    bench("flat (M,) x 1.28M 2d idx", flat, q2d)
    bench("flat (M,) x 1.28M sorted idx", flat, qs)
    bench("rows (M,2) x 1.28M", rows2, q2d)
    bench("rows (M/4,8) x 1.28M", rows8, jnp.asarray(
        rng.integers(0, M // 4, size=(4096, 312)).astype(np.int32)))
    bench("anc rows (20k,21) x 524K", rows21, q_small2d)
    bench("anc rows (20k,128) x 524K", rows128, q_small2d)
    bench("small flat (20k,) x 524K", small_flat, q_small2d)

    # one-hot matmul gather from small table: (B,K) idx into (20k, 21)
    tab = rows21.astype(jnp.bfloat16)

    # segment the table: idx -> one-hot over 20k is too wide; try via
    # 2-level: hi = idx // 128 (157 groups), lo = idx % 128
    @jax.jit
    def take_dot(rows, q):
        # direct one-hot (B*K, 20000) @ (20000, 21) in bf16, never
        # materialized? XLA will materialize; measure anyway at B=512
        oh = (q[..., None] == jnp.arange(rows.shape[0], dtype=jnp.int32)
              ).astype(jnp.bfloat16)
        r = jnp.einsum("bk t, t d -> bk d".replace(" ", ""), oh, tab,
                       preferred_element_type=jnp.float32)
        return r.sum(-1).astype(jnp.int32).sum(-1)

    t = timeit(take_dot, rows21, q_small2d[:512])
    print(f"{'onehot-matmul (20k,21) x 64K':44s} {t*1e3:8.2f} ms  "
          f"{t/ (512*128) * 1e9:7.2f} ns/row")


if __name__ == "__main__":
    main()
