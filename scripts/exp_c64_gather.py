"""Is the XLA TPU row-gather element-count bound? If so, bitcasting
bucket rows to wider element types (complex64 = 8 B/element) halves the
per-row element count and could ~2x the probe.

Pure gather-rate microbench: (nb, 16) int32 rows vs the SAME bytes as
(nb, 8) complex64 and (nb, 4) complex128-equivalent... complex128 needs
x64; we test int32 / f32x2-as-complex64. Checksums confirm the bytes
gathered are identical (bitcast back on device).
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
    rows_i32 = rng.integers(-(2 ** 31), 2 ** 31 - 1, size=(NB, 16),
                            dtype=np.int64).astype(np.int32)
    rows_c64 = rows_i32.view(np.complex64)  # (NB, 8), same bytes
    idx = rng.integers(0, NB, size=NQ).astype(np.int32)

    d_i32 = jax.device_put(rows_i32)
    d_c64 = jax.device_put(rows_c64)
    d_idx = jax.device_put(idx)

    def g_i32(rows, idx):
        r = jnp.take(rows, idx, axis=0)  # (NQ, 16)
        return r.astype(jnp.float32).sum()

    def g_c64(rows, idx):
        r = jnp.take(rows, idx, axis=0)  # (NQ, 8) complex64
        # bitcast back to int32 lanes to prove the bytes are usable
        f = jax.lax.bitcast_convert_type(r, jnp.float32)  # (NQ, 8, 2)?
        i = jax.lax.bitcast_convert_type(f, jnp.int32)
        return i.astype(jnp.float32).sum()

    modes = {"i32x16": (jax.jit(g_i32), (d_i32, d_idx)),
             "c64x8": (jax.jit(g_c64), (d_c64, d_idx))}
    expect = None
    for name, (fn, args) in modes.items():
        t0 = time.perf_counter()
        got = float(np.asarray(fn(*args)))
        compile_s = time.perf_counter() - t0
        if expect is None:
            expect = got
        ok = abs(got - expect) <= abs(expect) * 1e-6
        t0 = time.perf_counter()
        reps = 0
        while time.perf_counter() - t0 < 5.0:
            np.asarray(fn(*args))
            reps += 1
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "mode": name,
            "mrows_per_s": round(NQ / dt / 1e6, 1),
            "checksum_ok": bool(ok),
            "reps": reps,
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
