"""Sharded-table pipeline tests on the emulated 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from umgap_tpu.agg import device as devagg
from umgap_tpu.index.table import KmerTable
from umgap_tpu.ops import kmers as kmerops
from umgap_tpu.ops import lookup
from umgap_tpu.parallel import (
    ShardedTable,
    build_sharded_tables,
    make_mesh,
    make_sharded_pipeline,
)
from umgap_tpu.parallel.sharded import sharded_probe_local
from umgap_tpu.pipeline import PRESETS, make_pipeline
from umgap_tpu.taxonomy import Taxonomy, fixture_taxa

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_sharded_probe_matches_single(monkeypatch):
    rng = np.random.default_rng(3)
    n = 4000
    packed = np.unique(rng.integers(0, 2 ** 45, size=2 * n).astype(np.uint64))[:n]
    values = rng.integers(1, 1000, size=n).astype(np.int32)
    table = KmerTable.build(packed, values, k=9)

    mesh = make_mesh(8)
    shards = build_sharded_tables(packed, values, k=9, n_shards=8)
    stable = ShardedTable.from_shards(shards, mesh)

    queries = np.concatenate(
        [packed[:512], (packed[:512] + np.uint64(3)) % np.uint64(2 ** 45)]
    )[:1024]
    hi, lo = kmerops.split_packed(queries)
    expect_v, expect_f = table.probe_host(hi, lo)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(hi, lo, rows, stash):
        return sharded_probe_local(
            hi, lo, jnp.ones_like(hi, bool), rows[0],
            stable.max_probes, "x", kind=stable.kind, nb_bits=stable.nb_bits,
            bucket=stable.bucket, shard_stash=stash[0])

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("x"), P("x"), P("x", None, None), P("x", None, None)),
        out_specs=(P("x"), P("x")),
        check_vma=False,
    )
    got_v, got_f = fn(jnp.asarray(hi), jnp.asarray(lo), stable.rows,
                      stable.stash)
    assert np.asarray(got_v).tolist() == expect_v.tolist()
    assert np.asarray(got_f).tolist() == expect_f.tolist()


def test_sharded_pipeline_matches_single_chip():
    from umgap_tpu.ops import encoding

    rng = np.random.default_rng(9)
    tax = Taxonomy(fixture_taxa())
    dtax = devagg.DeviceTaxonomy.from_host(tax)

    # toy index: random 9-mers -> fixture taxa
    n = 500
    packed = np.unique(rng.integers(0, 2 ** 45, size=2 * n).astype(np.uint64))[:n]
    ids = np.array([2, 10239, 12884, 185751, 185752], dtype=np.int32)
    values = rng.choice(ids, size=n).astype(np.int32)
    table = KmerTable.build(packed, values, k=9)

    mesh = make_mesh(8)
    shards = build_sharded_tables(packed, values, k=9, n_shards=8)
    stable = ShardedTable.from_shards(shards, mesh)

    config = PRESETS["max-sensitivity"]._replace(k_max=32)
    B, E, L = 16, 2, 60
    dna = rng.integers(0, 4, size=(B, E, L)).astype(np.uint8)
    lengths = np.full((B, E), L, dtype=np.int32)

    single = make_pipeline(dtax, lookup.DeviceTable.from_host(table), config)
    expect = np.asarray(single(dna, lengths))

    sharded = make_sharded_pipeline(dtax, stable, config, mesh)
    got, freq = sharded(dna, lengths)
    assert np.asarray(got).tolist() == expect.tolist()
    assert np.asarray(freq).sum() == B
