"""A/B: split remainder/value planes for the bucket8s probe.

VERDICT r2 weak #7: the hot probe gathers a 64 B (8 rem + 8 val) row per
query; the measured v5e gather rate RISES as rows narrow (32 B ~103 M
rows/s vs 64 B ~90 M, scripts/exp_probe2.py).  Candidate layouts:

  fused64 : today's layout — one 64 B row gather.
  split2  : 32 B remainder-row gather + 32 B value-row gather (2x32).
  splitflat: 32 B remainder-row gather + ONE flat 4 B value gather at
             the hit slot (narrowest traffic; but 1-element gathers
             historically cost ~10 ns/element on this backend).

Probe-only, device-resident, on-device checksum materialized per rep
(the axon block_until_ready does not actually block).  Run on the real
chip; prints one JSON line per mode.
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

from umgap_tpu.index.table import build_kmer_table, mix_key  # noqa: E402
from umgap_tpu.ops import kmers as kmerops, lookup  # noqa: E402

N_KEYS = int(os.environ.get("N_KEYS", 2_000_000))
N_QUERIES = int(os.environ.get("N_QUERIES", 1 << 22))  # 4M per rep


def main():
    rng = np.random.default_rng(3)
    packed = np.unique(rng.integers(0, 2 ** 45, size=int(1.05 * N_KEYS),
                                    dtype=np.uint64))[:N_KEYS]
    values = rng.integers(1, 1 << 22, size=N_KEYS).astype(np.int32)
    table = build_kmer_table(packed, values, k=9)
    assert table.bucket == 8 and table.max_probes == 0
    nb = table.n_buckets
    nb_bits = table.nb_bits

    rows = lookup.pack_rows(table)              # (nb, 16)
    rem_plane = np.ascontiguousarray(rows[:, :8])   # (nb, 8) 32 B
    val_plane = np.ascontiguousarray(rows[:, 8:])   # (nb, 8) 32 B
    val_flat = np.ascontiguousarray(val_plane.reshape(-1))

    # queries: 70% hits
    qi = rng.integers(0, N_KEYS, size=N_QUERIES)
    q = packed[qi]
    miss = rng.random(N_QUERIES) < 0.3
    q[miss] = rng.integers(0, 2 ** 45, size=int(miss.sum()),
                           dtype=np.uint64)
    hi, lo = kmerops.split_packed(q)

    def slots(hi, lo):
        mhi, mlo = mix_key(hi, lo)
        bucket = (mlo & np.uint32(nb - 1)).astype(jnp.int32)
        rem = ((mlo >> np.uint32(nb_bits))
               | (mhi << np.uint32(25 - nb_bits))).astype(jnp.int32)
        return bucket, rem

    def fused64(hi, lo, rows):
        bucket, rem = slots(hi, lo)
        row = jnp.take(rows, bucket, axis=0)
        hit8 = row[:, :8] == rem[:, None]
        val = jnp.sum(jnp.where(hit8, row[:, 8:], 0), axis=-1)
        return val.astype(jnp.int64).sum()

    def split2(hi, lo, rem_p, val_p):
        bucket, rem = slots(hi, lo)
        rr = jnp.take(rem_p, bucket, axis=0)
        hit8 = rr == rem[:, None]
        vv = jnp.take(val_p, bucket, axis=0)
        val = jnp.sum(jnp.where(hit8, vv, 0), axis=-1)
        return val.astype(jnp.int64).sum()

    def splitflat(hi, lo, rem_p, val_f):
        bucket, rem = slots(hi, lo)
        rr = jnp.take(rem_p, bucket, axis=0)
        hit8 = rr == rem[:, None]
        slot = jnp.argmax(hit8, axis=-1).astype(jnp.int32)
        anyhit = jnp.any(hit8, axis=-1)
        v = jnp.take(val_f, bucket * 8 + slot)
        val = jnp.where(anyhit, v, 0)
        return val.astype(jnp.int64).sum()

    dhi = jax.device_put(hi)
    dlo = jax.device_put(lo)
    drows = jax.device_put(rows)
    drem = jax.device_put(rem_plane)
    dval = jax.device_put(val_plane)
    dvf = jax.device_put(val_flat)

    modes = {
        "fused64": (jax.jit(fused64), (dhi, dlo, drows)),
        "split2": (jax.jit(split2), (dhi, dlo, drem, dval)),
        "splitflat": (jax.jit(splitflat), (dhi, dlo, drem, dvf)),
    }
    expect = None
    for name, (fn, args) in modes.items():
        t0 = time.perf_counter()
        got = int(np.asarray(fn(*args)))
        compile_s = time.perf_counter() - t0
        if expect is None:
            expect = got
        assert got == expect, (name, got, expect)
        t0 = time.perf_counter()
        reps = 0
        while time.perf_counter() - t0 < 5.0:
            np.asarray(fn(*args))
            reps += 1
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "mode": name,
            "mrows_per_s": round(N_QUERIES / dt / 1e6, 1),
            "ms_per_4M": round(dt * 1e3, 2),
            "reps": reps,
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
