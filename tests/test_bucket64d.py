"""Dense bucket64 (``bucket64d``) layout: conveyor-placed 64-slot
buckets at ~0.87 load — ~1.76x the keys of bucket64s in the same
artifact bytes (~9.2 B/key, denser than the reference's ~10 B/key FST,
/root/reference/README.md:54-57) probed in <=2 adjacent rows.

Covers: placement density (stash ~0, max_probes == 1 at high load),
host+device probe exactness at 0.87 load, packed save/load + items()
roundtrips through the displacement tags, and the serving-assembly
refusal on mixed bucket64s/bucket64d artifacts.
"""

import numpy as np
import pytest

from umgap_tpu.index.table import KmerTable, load_table
from umgap_tpu.ops import kmers as kmerops

CAP = 1 << 21            # the bucket64 minimum (64 << MIN_NB_BITS)
LOAD = 0.87


@pytest.fixture(scope="module")
def dense_table():
    rng = np.random.default_rng(11)
    n = int(CAP * LOAD)
    keys = rng.choice(2 ** 45, size=n, replace=False).astype(np.uint64)
    vals = rng.integers(1, 1 << 20, size=n).astype(np.int32)
    t = KmerTable.build(keys, vals, k=9, bucket=64, max_probe_limit=1,
                        capacity=CAP, stash_cap=256)
    return t, keys, vals


def test_dense_placement_density(dense_table):
    t, keys, vals = dense_table
    assert t.capacity == CAP          # no capacity doubling at 0.87
    assert t.max_probes == 1          # conveyor displaced some keys
    assert len(t.stash_val) <= 8      # carry absorbs ~all overflow
    # realized bytes/key: 8 B/slot over the load factor
    assert 8 / LOAD < 9.5


def test_dense_probe_host_exact(dense_table):
    t, keys, vals = dense_table
    hi, lo = kmerops.split_packed(keys)
    out, found = t.probe_host(hi, lo)
    assert found.all()
    assert (out == vals).all()
    rng = np.random.default_rng(12)
    miss = rng.choice(2 ** 45, size=50_000).astype(np.uint64)
    miss = miss[~np.isin(miss, keys)]
    mh, ml = kmerops.split_packed(miss)
    _, f2 = t.probe_host(mh, ml)
    assert not f2.any()


def test_dense_probe_device_exact(dense_table):
    from umgap_tpu.ops import lookup

    t, keys, vals = dense_table
    hi, lo = kmerops.split_packed(keys)
    dt = lookup.DeviceTable.from_host(t)
    sel = np.random.default_rng(13).permutation(len(keys))[:200_000]
    out, found = lookup.probe(dt, np.asarray(hi[sel]), np.asarray(lo[sel]))
    assert np.asarray(found).all()
    assert (np.asarray(out) == vals[sel]).all()
    rng = np.random.default_rng(14)
    miss = rng.choice(2 ** 45, size=50_000).astype(np.uint64)
    miss = miss[~np.isin(miss, keys)]
    mh, ml = kmerops.split_packed(miss)
    _, f2 = lookup.probe(dt, np.asarray(mh), np.asarray(ml))
    assert not np.asarray(f2).any()


def test_dense_packed_roundtrip_and_items(dense_table, tmp_path):
    t, keys, vals = dense_table
    p = str(tmp_path / "dense.npz")
    t.save(p, packed=True)
    t2 = load_table(p)
    assert t2.max_probes == 1 and t2.n == t.n and t2.bucket == 64
    # items() reconstructs displaced keys through the distance tag
    k2, v2 = t2.items()
    order = np.argsort(k2, kind="stable")
    korder = np.argsort(keys, kind="stable")
    assert (k2[order] == keys[korder]).all()
    assert (v2[order] == vals[korder]).all()


def test_mixed_dense_sparse_shards_refused(tmp_path):
    import jax
    from jax.sharding import Mesh

    from umgap_tpu.parallel.sharded import ShardedTable

    rng = np.random.default_rng(15)
    n_d = int(CAP * 0.8)
    n_s = int(CAP * 0.4)
    kd = rng.choice(2 ** 45, size=n_d, replace=False).astype(np.uint64)
    ks = rng.choice(2 ** 45, size=n_s, replace=False).astype(np.uint64)
    dense = KmerTable.build(kd, np.ones(n_d, np.int32), k=9, bucket=64,
                            max_probe_limit=1, capacity=CAP)
    sparse = KmerTable.build(ks, np.ones(n_s, np.int32), k=9, bucket=64,
                             max_probe_limit=0, capacity=CAP)
    assert dense.max_probes != sparse.max_probes
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    with pytest.raises(ValueError, match="geometry mismatch"):
        ShardedTable.from_shards([dense, sparse], mesh, devices=1)
