"""Hot-op microbenchmarks on the real chip: what is actually slow?

Measures (per batch size): dispatch floor, raw row-gather throughput at
several row widths, kmer-bucket vs cuckoo probe, translate variants
(one-hot revcomp vs flip+gather), seedextend scan, and aggregation —
to direct the optimization work with data instead of guesses.

Run: python scripts/exp_hotops.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(fn, *args, secs=2.0):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)  # warm + materialize
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < secs:
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
        reps += 1
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # --- dispatch floor ------------------------------------------------ #
    x = jax.device_put(np.zeros((8, 128), np.float32))
    f = jax.jit(lambda a: a.sum())
    print(f"dispatch+sum floor: {timeit(f, x)*1e3:.3f} ms", flush=True)

    # --- raw gather: N indices into (R, W) int32 rows ------------------ #
    R = 262_144
    for W in (2, 8, 16, 32):
        rows = jax.device_put(rng.integers(0, 100, size=(R, W)).astype(np.int32))
        for N in (1 << 21, 1 << 23):
            idx = jax.device_put(
                rng.integers(0, R, size=N).astype(np.int32))
            g = jax.jit(lambda r, i: jnp.take(r, i, axis=0).sum())
            t = timeit(g, rows, idx)
            print(f"gather rows W={W:3d} N={N>>20}M: {t*1e3:8.3f} ms "
                  f"({N/t/1e6:8.1f} M rows/s, {N*W*4/t/2**30:6.1f} GiB/s)",
                  flush=True)

    # --- one-dim gather (values only) ---------------------------------- #
    vals = jax.device_put(rng.integers(0, 100, size=(R * 8,)).astype(np.int32))
    for N in (1 << 21, 1 << 23):
        idx = jax.device_put(rng.integers(0, R * 8, size=N).astype(np.int32))
        g = jax.jit(lambda r, i: jnp.take(r, i, axis=0).sum())
        t = timeit(g, vals, idx)
        print(f"gather 1d      N={N>>20}M: {t*1e3:8.3f} ms "
              f"({N/t/1e6:8.1f} M/s)", flush=True)

    # --- probe: kmer bucket table vs cuckoo ---------------------------- #
    from umgap_tpu.index.table import build_kmer_table
    from umgap_tpu.ops import lookup

    keys = np.fromfile(os.path.join(REPO, ".bench_data", "index_keys.bin"),
                       np.uint64)
    tvals = np.fromfile(os.path.join(REPO, ".bench_data", "index_vals.bin"),
                        np.int32)
    queries = rng.choice(keys, size=1 << 22, replace=True)
    miss = rng.integers(0, 2 ** 45, size=1 << 22, dtype=np.uint64)
    q = np.where(rng.random(1 << 22) < 0.2, queries, miss)
    qhi = jax.device_put((q >> np.uint64(25)).astype(np.int32))
    qlo = jax.device_put((q & np.uint64((1 << 25) - 1)).astype(np.int32))

    for name in ("bucket16", "bucket8", "bucket4", "cuckoo"):
        try:
            table = build_kmer_table(keys, tvals, k=9, layout=name)
        except Exception as e:
            print(f"{name}: build failed: {e}", flush=True)
            continue
        dt = lookup.DeviceTable.from_host(table, device=dev)
        p = jax.jit(lambda t, h, l: lookup.probe(t, h, l)[0].sum())
        t = timeit(p, dt, qhi, qlo)
        print(f"probe[{name}] 4M keys: {t*1e3:8.3f} ms "
              f"({(1<<22)/t/1e6:7.1f} M probes/s)", flush=True)

    # --- translate variants -------------------------------------------- #
    from umgap_tpu.ops import encoding as enc
    from umgap_tpu.ops import translate as tr

    table = enc.get_table(1)
    for B in (8192, 32768):
        dna = jax.device_put(
            rng.integers(0, 4, size=(B, 100)).astype(np.uint8))
        lens = jax.device_put(np.full(B, 100, np.int32))
        f = jax.jit(lambda d, l: tr.translate6_batch(d, l, table)[0]
                    .astype(jnp.int32).sum())
        t = timeit(f, dna, lens)
        print(f"translate6 onehot B={B}: {t*1e3:8.3f} ms "
              f"({B/t/1e3:8.1f} K reads/s)", flush=True)

        # flip+gather variant
        def t6_gather(d, l):
            L = d.shape[1]
            fwd = jnp.where(d <= 4, d.astype(jnp.int32), 4)
            e = jnp.flip(fwd, axis=1)
            e = jnp.where(e < 4, 3 - e, 4)
            shift = (jnp.int32(L) - l).astype(jnp.int32)
            idx = (jnp.arange(L, dtype=jnp.int32)[None, :] + shift[:, None])
            idx = jnp.clip(idx, 0, L - 1)
            rc = jnp.take_along_axis(e, idx, axis=1)
            rc = jnp.where(jnp.arange(L)[None, :] < l[:, None], rc, 4)
            out = fwd.sum() + rc.sum()
            return out
        g = jax.jit(t6_gather)
        t = timeit(g, dna, lens)
        print(f"revcomp flip+gather B={B}: {t*1e3:8.3f} ms", flush=True)

        # roll variant: shift via two static slices selected by compare
        def t6_roll(d, l):
            L = d.shape[1]
            fwd = jnp.where(d <= 4, d.astype(jnp.int32), 4)
            e = jnp.flip(fwd, axis=1)
            e = jnp.where(e < 4, 3 - e, 4)
            # all reads same length in this workload: static shift 0
            return fwd.sum() + e.sum()
        g2 = jax.jit(t6_roll)
        t = timeit(g2, dna, lens)
        print(f"revcomp static-flip B={B}: {t*1e3:8.3f} ms", flush=True)

    # --- full stage scaling with batch --------------------------------- #
    from umgap_tpu.ops import kmers as kmerops, seedextend
    for B in (4096, 16384):
        dna = jax.device_put(
            rng.integers(0, 4, size=(B * 2, 100)).astype(np.uint8))
        lens = jax.device_put(np.full(B * 2, 100, np.int32))

        def full_front(d, l):
            aa, plens = tr.translate6_batch(d, l, table)
            hi, lo, wv = kmerops.pack_windows_batch(aa, plens, 9)
            return hi.sum() + lo.sum() + wv.sum()
        f = jax.jit(full_front)
        t = timeit(f, dna, lens)
        print(f"translate+pack B={B}pairs: {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
