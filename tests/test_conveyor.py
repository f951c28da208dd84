"""Conveyor placement for dense 2-round k-mer tables.

Carried keys take priority over home arrivals in the overflow bucket —
the optimal flow for the distance-<=1 displacement scheme.  This lifted
the bucket16 load ceiling from ~0.45 (round-based insertion overflowed
the 256-slot stash at 262M-key shards, forcing a capacity double) to
~0.9, with identical probe semantics."""

import numpy as np
import pytest

from umgap_tpu.index.table import (
    EMPTY,
    KmerTable,
    _insert_conveyor,
    _insert_conveyor_slow,
)


@pytest.mark.parametrize("load,nb", [(0.3, 256), (0.85, 256),
                                     (0.95, 64), (0.99, 1024)])
def test_conveyor_paths_identical(load, nb):
    """numpy fast path == native C++ == sequential oracle, slot for
    slot, across loads up to ~full."""
    rng = np.random.default_rng(int(load * 100) + nb)
    bucket = 16
    cap = nb * bucket
    n = int(cap * load)
    b0 = rng.integers(0, nb, size=n).astype(np.int64)
    p0 = rng.integers(0, 1 << 29, size=n).astype(np.int32)
    p1 = rng.integers(0, 1000, size=n).astype(np.int32)
    o_np, mp_np, st_np = _insert_conveyor(b0, [p0, p1], cap, bucket,
                                          use_native=False)
    outs_s = [np.full(cap, EMPTY if i == 0 else 0, np.int32)
              for i in range(2)]
    o_sl, _mp, st_sl = _insert_conveyor_slow(b0, [p0, p1], cap, bucket,
                                             outs_s)
    assert all(np.array_equal(a, b) for a, b in zip(o_np, o_sl))
    assert np.array_equal(st_np, np.sort(st_sl))
    try:
        from umgap_tpu.io.native import insert_conveyor_native

        o_nat, mp_nat, st_nat = insert_conveyor_native(
            b0, [p0, p1], cap, bucket)
    except (RuntimeError, OSError):
        pytest.skip("native toolchain unavailable")
    assert all(np.array_equal(a, b) for a, b in zip(o_np, o_nat))
    assert np.array_equal(st_np, st_nat)
    assert mp_np == mp_nat


def test_dense_bucket16_exact():
    """A bucket16 table at ~0.72 realized load probes exactly (every
    key found with its value, misses miss, items() round-trips) with a
    near-empty stash — the geometry the at-scale shards build at."""
    rng = np.random.default_rng(7)
    keys = np.unique(rng.integers(0, 2 ** 45, size=1_500_000,
                                  dtype=np.uint64))
    vals = rng.integers(1, 10000, size=len(keys)).astype(np.int32)
    t = KmerTable.build(keys, vals, k=9, bucket=16, max_probe_limit=1,
                        load_factor=0.8, stash_cap=256)
    assert len(keys) / t.capacity > 0.6
    assert len(t.stash_hi) < 64
    from umgap_tpu.ops import kmers

    hi, lo = kmers.split_packed(keys)
    v, f = t.probe_host(hi, lo)
    assert f.all() and np.array_equal(v, vals)
    miss = rng.integers(0, 2 ** 45, size=100_000, dtype=np.uint64)
    miss = miss[~np.isin(miss, keys)]
    mh, ml = kmers.split_packed(miss)
    _, mf = t.probe_host(mh, ml)
    assert not mf.any()
    ip, iv = t.items()
    o = np.argsort(ip)
    assert np.array_equal(ip[o], keys) and np.array_equal(iv[o], vals)


def test_dense_bucket16_device_probe():
    """The unchanged device probe serves conveyor-placed tables."""
    import jax.numpy as jnp

    from umgap_tpu.ops import kmers, lookup

    rng = np.random.default_rng(8)
    keys = np.unique(rng.integers(0, 2 ** 45, size=200_000,
                                  dtype=np.uint64))
    vals = rng.integers(1, 10000, size=len(keys)).astype(np.int32)
    t = KmerTable.build(keys, vals, k=9, bucket=16, max_probe_limit=1,
                        load_factor=0.8)
    dt = lookup.DeviceTable.from_host(t)
    hi, lo = kmers.split_packed(keys[:50_000])
    v, f = lookup.probe(dt, jnp.asarray(hi), jnp.asarray(lo))
    assert np.asarray(f).all()
    assert np.array_equal(np.asarray(v), vals[:50_000])
