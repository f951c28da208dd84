"""Packed on-disk wire layout (round-5 item: cold start = pure transfer).

``KmerTable.save(packed=True)`` stores the exact (n_buckets, 2*bucket)
rows that ``jax.device_put`` transfers, so an mmap'd serving load does
ZERO host-side repacking — the analogue of the reference's mmap
load-and-go (/root/reference/src/commands/pept2lca.rs:74-79).
"""

import numpy as np
import pytest

from umgap_tpu.index.table import KmerTable, build_kmer_table, load_table
from umgap_tpu.ops import lookup


def _toy(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    packed = np.unique(rng.integers(0, 2**45, size=2 * n).astype(np.uint64))[:n]
    values = rng.integers(1, 1 << 20, size=len(packed)).astype(np.int32)
    return packed, values


@pytest.mark.parametrize("layout", ["bucket8s", "bucket64s", "bucket16"])
def test_packed_roundtrip_probe_and_items(tmp_path, layout):
    packed, values = _toy()
    t = build_kmer_table(packed, values, k=9, layout=layout)
    ref_rows = lookup.pack_rows(t)

    path = tmp_path / "idx.npz"
    t.save(path, packed=True)
    for mmap in (False, True):
        t2 = load_table(path, mmap=mmap)
        assert t2.rows_packed is not None
        # pack_rows is the zero-copy identity on a packed artifact
        assert lookup.pack_rows(t2) is t2.rows_packed
        np.testing.assert_array_equal(np.asarray(t2.rows_packed), ref_rows)
        assert t2.capacity == t.capacity
        assert t2.bucket == t.bucket
        assert t2.max_probes == t.max_probes

        # lazily materialized rem/values drive the host probe + items
        from umgap_tpu.ops import kmers as kmerops

        hi, lo = kmerops.split_packed(packed[:512])
        v_ref, f_ref = t.probe_host(hi, lo)
        v2, f2 = t2.probe_host(hi, lo)
        np.testing.assert_array_equal(v2, v_ref)
        np.testing.assert_array_equal(f2, f_ref)

        p_ref, val_ref = t.items()
        p2, val2 = t2.items()
        np.testing.assert_array_equal(p2, p_ref)
        np.testing.assert_array_equal(val2, val_ref)


def test_packed_device_probe_parity(tmp_path):
    packed, values = _toy(2000, seed=9)
    t = build_kmer_table(packed, values, k=9)
    path = tmp_path / "idx.npz"
    t.save(path, packed=True)
    t2 = load_table(path, mmap=True)

    from umgap_tpu.ops import kmers as kmerops

    hi, lo = kmerops.split_packed(packed[:256])
    d_ref = lookup.DeviceTable.from_host(t)
    d2 = lookup.DeviceTable.from_host(t2)
    v_ref, f_ref = lookup.probe(d_ref, hi.astype(np.int32), lo.astype(np.int32))
    v2, f2 = lookup.probe(d2, hi.astype(np.int32), lo.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(f2), np.asarray(f_ref))


def test_repack_shards_in_place(tmp_path):
    """repack_shards converts a legacy (rem/values) workdir atomically;
    items and geometry survive byte-for-byte, and it is idempotent."""
    import json

    from umgap_tpu.index import distbuild

    packed, values = _toy(4000, seed=11)
    work = tmp_path / "work"
    (work / "shards").mkdir(parents=True)
    n_shards = 4
    from umgap_tpu.parallel.sharded import build_sharded_tables

    shards = build_sharded_tables(packed, values, k=9, n_shards=n_shards,
                                  layout="bucket16")
    for s, t in enumerate(shards):
        t.save(work / "shards" / f"shard_{s:03d}.npz", compress=False)
    with open(work / "manifest.json", "w") as f:
        json.dump({"n_shards": n_shards, "k": 9, "layout": "bucket16",
                   "capacity": shards[0].capacity}, f)

    before = [t.items() for t in distbuild.load_shards(str(work))]
    n = distbuild.repack_shards(str(work))
    assert n == n_shards
    after_shards = distbuild.load_shards(str(work), mmap=True)
    for t, (p_ref, v_ref) in zip(after_shards, before):
        assert t.rows_packed is not None
        p, v = t.items()
        np.testing.assert_array_equal(p, p_ref)
        np.testing.assert_array_equal(v, v_ref)
    # idempotent: second run rewrites nothing
    assert distbuild.repack_shards(str(work)) == 0


def test_from_shards_accepts_packed_mmap(tmp_path):
    """ShardedTable.from_shards over packed mmap'd shards probes
    identically to in-memory shards (the production --shards path)."""
    import jax

    from umgap_tpu.index.table import load_table as lt
    from umgap_tpu.parallel import ShardedTable, make_mesh
    from umgap_tpu.parallel.sharded import build_sharded_tables

    packed, values = _toy(3000, seed=5)
    shards = build_sharded_tables(packed, values, k=9, n_shards=8)
    paths = []
    for s, t in enumerate(shards):
        p = tmp_path / f"shard_{s:03d}.npz"
        t.save(p, packed=True)
        paths.append(p)
    loaded = [lt(p, mmap=True) for p in paths]

    mesh = make_mesh(8)
    st_ref = ShardedTable.from_shards(shards, mesh)
    st2 = ShardedTable.from_shards(loaded, mesh)
    np.testing.assert_array_equal(np.asarray(st2.rows), np.asarray(st_ref.rows))
    np.testing.assert_array_equal(np.asarray(st2.stash),
                                  np.asarray(st_ref.stash))


def test_chunked_probe_parity():
    """The memory-bounded chunked probe (round-5 item 3) is bit-identical
    to the one-shot probe for hits, misses, masks, and grouped tables."""
    import jax.numpy as jnp

    from umgap_tpu.ops import kmers as kmerops

    packed, values = _toy(4000, seed=17)
    t = build_kmer_table(packed, values, k=9, layout="bucket64s")
    d = lookup.DeviceTable.from_host(t)

    rng = np.random.default_rng(2)
    mix = np.concatenate([packed[:800],
                          rng.integers(0, 2**45, 800).astype(np.uint64)])
    hi, lo = kmerops.split_packed(mix)
    hi = jnp.asarray(hi.astype(np.int32)).reshape(40, 40)
    lo = jnp.asarray(lo.astype(np.int32)).reshape(40, 40)
    valid = jnp.asarray(rng.random((40, 40)) < 0.9)

    v_ref, f_ref = lookup.probe(d, hi, lo, valid=valid, chunk_bytes=0)
    # tiny chunk budget: forces many chunks + padding of the last one
    v_c, f_c = lookup.probe(d, hi, lo, valid=valid, chunk_bytes=17 * 512)
    np.testing.assert_array_equal(np.asarray(v_c), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(f_c), np.asarray(f_ref))


def test_chunked_probe_parity_grouped():
    import jax

    from umgap_tpu.parallel import ShardedTable, make_mesh
    from umgap_tpu.parallel.sharded import build_sharded_tables, owner_of
    from umgap_tpu.ops import kmers as kmerops
    import jax.numpy as jnp

    packed, values = _toy(3000, seed=23)
    shards = build_sharded_tables(packed, values, k=9, n_shards=4)
    rows = np.concatenate([lookup.pack_rows(t) for t in shards])
    stash = jnp.zeros((0, 3), jnp.int32)
    d = lookup.DeviceTable(jnp.asarray(rows), shards[0].max_probes,
                           "kmer", shards[0].nb_bits,
                           bucket=shards[0].bucket, stash=stash, group=4)
    hi, lo = kmerops.split_packed(packed[:1024])
    hi = jnp.asarray(hi.astype(np.int32))
    lo = jnp.asarray(lo.astype(np.int32))
    sub = owner_of(hi, lo, 4)
    v_ref, f_ref = lookup.probe(d, hi, lo, sub=sub, chunk_bytes=0)
    v_c, f_c = lookup.probe(d, hi, lo, sub=sub, chunk_bytes=11 * 64)
    np.testing.assert_array_equal(np.asarray(v_c), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(f_c), np.asarray(f_ref))
    assert np.asarray(f_ref).all()


def test_items_bucket_range(tmp_path):
    """Ranged items() reconstructs exactly the keys whose slots sit in
    [b0, b1) — matching full items() filtered to those slots — without
    touching the rest of a packed mmap'd artifact."""
    packed, values = _toy(6000, seed=31)
    t = build_kmer_table(packed, values, k=9, layout="bucket64s")
    path = tmp_path / "idx.npz"
    t.save(path, packed=True)
    t2 = load_table(path, mmap=True)

    full_p, full_v = t.items()
    bk = t.bucket
    # slot positions of full items (occupied slots, stash excluded)
    occ = np.nonzero(t.rem != -1)[0]
    for b0, b1 in ((0, 4), (3, 9), (t.n_buckets - 2, t.n_buckets)):
        sel = (occ >= b0 * bk) & (occ < b1 * bk)
        p, v = t2.items(bucket_range=(b0, b1))
        np.testing.assert_array_equal(p, full_p[: len(occ)][sel])
        np.testing.assert_array_equal(v, full_v[: len(occ)][sel])
        # every ranged key probes exactly
        if len(p):
            pv, pf = t.probe_host(*__import__(
                "umgap_tpu.ops.kmers", fromlist=["split_packed"]
            ).split_packed(p.astype(np.uint64)))
            assert pf.all() and np.array_equal(pv, v)
