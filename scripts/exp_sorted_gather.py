"""Does index locality change the XLA TPU row-gather rate?

If gathers of SORTED indices run much faster than random ones (HBM
row-buffer / prefetch locality), the probe could sort queries by bucket,
gather, and invert — paying two device sorts + two 1-element gathers to
turn the hot 16-element-row gather quasi-sequential.

Modes (all (NB, 16) int32 rows, NQ queries):
  random   : uniform random indices (today's probe pattern)
  sorted   : the same indices pre-sorted on host (pure locality effect)
  roundtrip: device argsort(idx) -> gather -> invert (what production
             would actually pay, including both permutations)
  sortcost : just the argsort+invert permutation machinery (no row
             gather) — isolates the overhead side of the trade.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

NB = int(os.environ.get("NB", 1 << 20))
NQ = int(os.environ.get("NQ", 1 << 22))


def main():
    rng = np.random.default_rng(0)
    rows = rng.integers(-(2 ** 31), 2 ** 31 - 1, size=(NB, 16),
                        dtype=np.int64).astype(np.int32)
    idx = rng.integers(0, NB, size=NQ).astype(np.int32)

    d_rows = jax.device_put(rows)
    d_idx = jax.device_put(idx)
    d_sorted = jax.device_put(np.sort(idx))

    def g(rows, idx):
        return jnp.take(rows, idx, axis=0).astype(jnp.float32).sum()

    def roundtrip(rows, idx):
        order = jnp.argsort(idx)
        r = jnp.take(rows, jnp.take(idx, order), axis=0)  # (NQ, 16)
        v = r[:, 0]  # pretend the probe resolved one value per query
        inv = jnp.argsort(order)
        out = jnp.take(v, inv)
        return out.astype(jnp.float32).sum() + r.astype(jnp.float32).sum()

    def sortcost(rows, idx):
        order = jnp.argsort(idx)
        inv = jnp.argsort(order)
        out = jnp.take(jnp.take(idx, order), inv)
        return out.astype(jnp.float32).sum()

    modes = {
        "random": (jax.jit(g), (d_rows, d_idx)),
        "sorted": (jax.jit(g), (d_rows, d_sorted)),
        "roundtrip": (jax.jit(roundtrip), (d_rows, d_idx)),
        "sortcost": (jax.jit(sortcost), (d_rows, d_idx)),
    }
    for name, (fn, args) in modes.items():
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 0
        while time.perf_counter() - t0 < 5.0:
            np.asarray(fn(*args))
            reps += 1
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "mode": name,
            "mrows_per_s": round(NQ / dt / 1e6, 1),
            "ms": round(dt * 1e3, 2),
            "reps": reps,
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
