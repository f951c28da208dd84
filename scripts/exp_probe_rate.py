"""Does the full probe() path realize the raw gather floor at scale?

exp_window_gather.py measured a FUSED single-row take+reduce at
11.2 ns/query on a 4.3 GB table — round 4's at-scale records implied
~18 ns inside serving.  This isolates where the probe spends that gap:

  raw take+sum        — the floor (gather fused into a reduction)
  probe() bucket64s   — full probe: mix, quotient, compare, select,
                        stash broadcast, chunked through lax.map
  probe() bucket64d   — the dense 2-round variant
  probe() no-chunk    — probe with chunking disabled (one-shot gather)

Usage: python scripts/exp_probe_rate.py [nb_bits=23] [Q=4194304]
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

from umgap_tpu.index.table import KmerTable
from umgap_tpu.ops import kmers as kmerops
from umgap_tpu.ops import lookup


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    return (time.perf_counter() - t0) / iters


def main():
    nb_bits = int(sys.argv[1]) if len(sys.argv) > 1 else 23
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 4 * 1024 * 1024
    cap = (1 << nb_bits) * 64
    rng = np.random.default_rng(0)
    print(f"capacity {cap} slots = {cap * 8 / 1e9:.2f} GB, "
          f"Q={Q / 1e6:.1f}M, device={jax.devices()[0].platform}",
          flush=True)

    # build both layouts over the same keys (sparse load for bucket64s)
    n = int(cap * 0.45)
    keys = rng.integers(0, 2 ** 45, size=n, dtype=np.uint64)
    keys = np.unique(keys)
    vals = rng.integers(1, 1 << 20, size=len(keys)).astype(np.int32)
    t_s = KmerTable.build(keys, vals, k=9, bucket=64, max_probe_limit=0,
                          capacity=cap, stash_cap=4096)
    t_d = KmerTable.build(keys, vals, k=9, bucket=64, max_probe_limit=1,
                          capacity=cap, stash_cap=4096)
    print(f"built: sparse max_probes={t_s.max_probes} "
          f"stash={len(t_s.stash_val)}; dense max_probes={t_d.max_probes} "
          f"stash={len(t_d.stash_val)}", flush=True)

    qsel = rng.integers(0, len(keys), size=Q)
    qhi, qlo = kmerops.split_packed(keys[qsel])
    qhi = jnp.asarray(qhi)
    qlo = jnp.asarray(qlo)

    ds = lookup.DeviceTable.from_host(t_s)
    dd = lookup.DeviceTable.from_host(t_d)

    # floor: fused take+reduce on the same rows array
    idx = jnp.asarray(rng.integers(0, ds.n_buckets, Q).astype(np.int32))
    floor = jax.jit(
        lambda t, i: jnp.take(t, i, axis=0).sum(axis=-1,
                                                dtype=jnp.int32).sum())
    dt = timeit(floor, ds.rows, idx)
    print(f"{'raw take+sum floor':28s} {dt * 1e3:8.2f} ms "
          f"{dt / Q * 1e9:6.2f} ns/q", flush=True)

    probe_j = jax.jit(lambda rows, stash, h, l, t=ds: lookup.probe(
        lookup.DeviceTable(rows, t.max_probes, t.kind, t.nb_bits,
                           t.bucket, stash, t.group), h, l))
    probe_d = jax.jit(lambda rows, stash, h, l, t=dd: lookup.probe(
        lookup.DeviceTable(rows, t.max_probes, t.kind, t.nb_bits,
                           t.bucket, stash, t.group), h, l))
    probe_nc = jax.jit(lambda rows, stash, h, l, t=ds: lookup.probe(
        lookup.DeviceTable(rows, t.max_probes, t.kind, t.nb_bits,
                           t.bucket, stash, t.group), h, l,
        chunk_bytes=0))

    for name, fn, tab in (("probe() bucket64s", probe_j, ds),
                          ("probe() bucket64d", probe_d, dd),
                          ("probe() no-chunk 64s", probe_nc, ds)):
        dt = timeit(fn, tab.rows, tab.stash, qhi, qlo)
        print(f"{name:28s} {dt * 1e3:8.2f} ms {dt / Q * 1e9:6.2f} ns/q",
              flush=True)


if __name__ == "__main__":
    main()
