"""Second-round gather/probe experiments: XLA variant knobs, sort cost,
dispatch-depth scaling, and large-batch amortization of the 34ms floor."""

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


def timeit(fn, *args, secs=2.0):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < secs:
        np.asarray(fn(*args))
        reps += 1
    return (time.perf_counter() - t0) / reps


def timeit_depth(fn, args_list, depth, secs=3.0):
    np.asarray(fn(*args_list[0]))
    t0 = time.perf_counter()
    inflight = []
    reps = 0
    while time.perf_counter() - t0 < secs:
        inflight.append(fn(*args_list[reps % len(args_list)]))
        if len(inflight) >= depth:
            np.asarray(inflight.pop(0))
        reps += 1
    for x in inflight:
        np.asarray(x)
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    R, W = 262_144, 16
    rows = jax.device_put(rng.integers(0, 100, size=(R, W)).astype(np.int32))
    N = 1 << 23
    idx_np = rng.integers(0, R, size=N).astype(np.int32)
    idx = jax.device_put(idx_np)

    base = jax.jit(lambda r, i: jnp.take(r, i, axis=0).sum())
    t = timeit(base, rows, idx)
    print(f"take baseline:        {t*1e3:8.2f} ms ({N/t/1e6:6.1f} M/s)", flush=True)

    # promise in bounds + unique
    def g2(r, i):
        out = jax.lax.gather(
            r, i[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, W),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            indices_are_sorted=False, unique_indices=False)
        return out.sum()
    t = timeit(jax.jit(g2), rows, idx)
    print(f"gather in-bounds:     {t*1e3:8.2f} ms ({N/t/1e6:6.1f} M/s)", flush=True)

    # sorted indices
    idx_sorted = jax.device_put(np.sort(idx_np))
    def g3(r, i):
        out = jax.lax.gather(
            r, i[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, W),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            indices_are_sorted=True, unique_indices=False)
        return out.sum()
    t = timeit(jax.jit(g3), rows, idx_sorted)
    print(f"gather sorted-idx:    {t*1e3:8.2f} ms ({N/t/1e6:6.1f} M/s)", flush=True)

    # 4-way split (does XLA overlap independent gathers?)
    def g4(r, i):
        parts = jnp.split(i, 4)
        return sum(jnp.take(r, p, axis=0).sum() for p in parts)
    t = timeit(jax.jit(g4), rows, idx)
    print(f"take 4-way split:     {t*1e3:8.2f} ms ({N/t/1e6:6.1f} M/s)", flush=True)

    # device-side sort cost (for sort-then-gather schemes)
    t = timeit(jax.jit(lambda i: jnp.sort(i).sum()), idx)
    print(f"sort 8M i32:          {t*1e3:8.2f} ms", flush=True)
    t = timeit(jax.jit(lambda i: jnp.argsort(i).sum()), idx)
    print(f"argsort 8M i32:       {t*1e3:8.2f} ms", flush=True)

    # sort + gather sorted (full scheme cost)
    def g5(r, i):
        s = jnp.sort(i)
        return jnp.take(r, s, axis=0).sum()
    t = timeit(jax.jit(g5), rows, idx)
    print(f"sort+take:            {t*1e3:8.2f} ms ({N/t/1e6:6.1f} M/s)", flush=True)

    # dispatch depth scaling on a fixed medium op
    medium = jax.jit(lambda r, i: jnp.take(r, i, axis=0).sum())
    idxs = [jax.device_put(rng.integers(0, R, size=1 << 21).astype(np.int32))
            for _ in range(8)]
    for depth in (1, 2, 4, 8):
        t = timeit_depth(lambda i: medium(rows, i), [(i,) for i in idxs], depth)
        print(f"2M take depth={depth}:     {t*1e3:8.2f} ms/dispatch "
              f"({(1<<21)/t/1e6:6.1f} M/s)", flush=True)

    # tiny op depth scaling: what floor can pipelining reach?
    x = jax.device_put(np.zeros((8, 128), np.float32))
    tiny = jax.jit(lambda a: a.sum())
    for depth in (1, 2, 4, 8, 16):
        t = timeit_depth(lambda a: tiny(a), [(x,)], depth)
        print(f"tiny depth={depth}:        {t*1e3:8.2f} ms/dispatch", flush=True)


if __name__ == "__main__":
    main()
