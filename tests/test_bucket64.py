"""bucket64s: the at-scale serving layout (one full-tile 512B row
gather per query — measured 4x the 2-round bucket16 probe rate beyond
the cache regime, PERF.md round 4)."""

import numpy as np
import pytest

from umgap_tpu.index.table import KmerTable, build_kmer_table


def _keys(n, seed=5):
    rng = np.random.default_rng(seed)
    keys = np.unique(rng.integers(0, 2 ** 45, size=n, dtype=np.uint64))
    vals = rng.integers(1, 10000, size=len(keys)).astype(np.int32)
    return keys, vals


def test_bucket64s_exact_single_round():
    keys, vals = _keys(400_000)
    t = build_kmer_table(keys, vals, k=9, layout="bucket64s")
    assert t.bucket == 64 and t.max_probes == 0
    assert len(t.stash_hi) < 64
    from umgap_tpu.ops import kmers

    hi, lo = kmers.split_packed(keys)
    v, f = t.probe_host(hi, lo)
    assert f.all() and np.array_equal(v, vals)
    miss = np.setdiff1d(
        np.random.default_rng(6).integers(0, 2 ** 45, 50_000,
                                          dtype=np.uint64), keys)
    mh, ml = kmers.split_packed(miss)
    _, mf = t.probe_host(mh, ml)
    assert not mf.any()
    ip, iv = t.items()
    o = np.argsort(ip)
    assert np.array_equal(ip[o], keys) and np.array_equal(iv[o], vals)


def test_bucket64s_device_and_grouped():
    """Device probe + grouped sub-shard probe with 64-slot buckets."""
    import jax.numpy as jnp

    from umgap_tpu.ops import kmers, lookup

    keys, vals = _keys(300_000)
    t = build_kmer_table(keys, vals, k=9, layout="bucket64s")
    dt = lookup.DeviceTable.from_host(t)
    hi, lo = kmers.split_packed(keys[:40_000])
    v, f = lookup.probe(dt, jnp.asarray(hi), jnp.asarray(lo))
    assert np.asarray(f).all()
    assert np.array_equal(np.asarray(v), vals[:40_000])


def test_sharded_pipeline_bucket64s():
    """The full sharded pipeline over bucket64s shards grouped 2-per-
    device matches the single-table result."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from umgap_tpu.agg import device as devagg
    from umgap_tpu.parallel import (
        ShardedTable,
        build_sharded_tables,
        make_mesh,
        make_sharded_pipeline,
    )
    from umgap_tpu.pipeline import PRESETS
    from umgap_tpu.pipeline.fused import make_pipeline
    from umgap_tpu.ops import lookup
    from umgap_tpu.taxonomy import Taxonomy, fixture_taxa

    rng = np.random.default_rng(0)
    tax = Taxonomy(fixture_taxa())
    dtax = devagg.DeviceTaxonomy.from_host(tax)
    packed = np.unique(rng.integers(0, 2 ** 45, size=4096).astype(np.uint64))
    ids = np.array([2, 10239, 12884, 185751, 185752], np.int32)
    values = rng.choice(ids, size=len(packed)).astype(np.int32)
    config = PRESETS["max-sensitivity"]._replace(k_max=32)
    B, E, L = 16, 2, 48
    dna = rng.integers(0, 4, size=(B, E, L)).astype(np.uint8)
    lens = np.full((B, E), L, np.int32)

    table = build_kmer_table(packed, values, k=9)
    ref = np.asarray(make_pipeline(
        dtax, lookup.DeviceTable.from_host(table), config)(dna, lens))

    mesh = make_mesh(8)
    shards = build_sharded_tables(packed, values, k=9, n_shards=16,
                                  layout="bucket64s")
    assert shards[0].bucket == 64
    stable = ShardedTable.from_shards(shards, mesh)
    assert stable.group == 2 and stable.bucket == 64
    taxa, _freq = make_sharded_pipeline(dtax, stable, config, mesh)(dna, lens)
    assert np.array_equal(np.asarray(taxa), ref)
