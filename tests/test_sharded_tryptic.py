"""Sharded tryptic pipeline + sharded correctness gaps: overflow
reroute, rmq/lca* under sharding, stash hits across shards."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from umgap_tpu.agg import device as devagg
from umgap_tpu.agg.device_rmq import DeviceEuler
from umgap_tpu.index.table import KmerTable, PeptideTable
from umgap_tpu.ops import encoding, kmers as kmerops, lookup, translate
from umgap_tpu.parallel import (
    ShardedAnalyser,
    ShardedTable,
    build_sharded_peptide_tables,
    build_sharded_tables,
    make_mesh,
    make_sharded_pipeline,
    make_sharded_tryptic_pipeline,
)
from umgap_tpu.pipeline import PRESETS, make_pipeline
from umgap_tpu.pipeline.tryptic import (
    TRYPTIC_PRESETS,
    tryptic_pipeline_step,
)
from umgap_tpu.taxonomy import Taxonomy, fixture_taxa

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

IDS = np.array([2, 10239, 12884, 185751, 185752], dtype=np.int32)


def _tryptic_world(rng, n_reads=16, L=60):
    """Random DNA whose frame peptides' digest fragments are indexed, so
    the sharded probe has real hits."""
    tax = Taxonomy(fixture_taxa())
    dtax = devagg.DeviceTaxonomy.from_host(tax)
    dna = rng.integers(0, 4, size=(n_reads, 2, L)).astype(np.uint8)
    lens = np.full((n_reads, 2), L, dtype=np.int32)
    # harvest every digest fragment of every frame as index keys
    table_ = encoding.get_table(1)
    frags = set()
    for r in range(n_reads):
        for e in range(2):
            seq = "".join("ACGT"[c] for c in dna[r, e])
            for pep in translate.translate_sequence(
                    seq, translate.FRAME_NAMES, table_):
                for f in kmerops.tryptic_digest(pep):
                    if 9 <= len(f) <= 45:
                        frags.add(f)
    frags = sorted(frags)
    if not frags:  # extremely unlikely at these sizes
        frags = ["AAAAAAAAAK"]
    values = rng.choice(IDS, size=len(frags)).astype(np.int32)
    return tax, dtax, dna, lens, frags, values


def test_sharded_tryptic_matches_single_chip():
    rng = np.random.default_rng(11)
    tax, dtax, dna, lens, frags, values = _tryptic_world(rng)
    ptable = PeptideTable.build(frags, values)
    dtable = lookup.DeviceTable.from_host(ptable)

    mesh = make_mesh(8)
    shards = build_sharded_peptide_tables(frags, values, n_shards=8)
    stable = ShardedTable.from_shards(shards, mesh)
    assert stable.kind == "peptide"

    for preset in ("tryptic-sensitivity", "tryptic-precision"):
        config = TRYPTIC_PRESETS[preset]._replace(k_max=32)
        expect = np.asarray(jax.jit(
            lambda d, l: tryptic_pipeline_step(d, l, dtax, dtable, config)
        )(dna, lens))
        step = make_sharded_tryptic_pipeline(dtax, stable, config, mesh)
        got, freq = step(dna, lens)
        assert np.asarray(got).tolist() == expect.tolist()
        assert float(np.asarray(freq).sum()) == len(dna)


def test_sharded_peptide_probe_exact():
    """Every indexed fragment resolves through owner routing to its own
    value; unknown fragments miss."""
    rng = np.random.default_rng(13)
    frags = []
    seen = set()
    while len(frags) < 300:
        f = "".join(rng.choice(list("ACDEFGHILMNQSTVWY"), 12))
        if f not in seen:
            seen.add(f)
            frags.append(f)
    values = np.arange(1, len(frags) + 1, dtype=np.int32)
    mesh = make_mesh(8)
    shards = build_sharded_peptide_tables(frags, values, n_shards=8)
    stable = ShardedTable.from_shards(shards, mesh)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from umgap_tpu.index.table import _fingerprints
    from umgap_tpu.parallel.sharded import sharded_probe_local

    hi, lo = _fingerprints(frags + ["WWWWWWWWWWWW"] * 20)
    pad = (-len(hi)) % 8
    hi = np.pad(hi, (0, pad)).astype(np.int32)
    lo = np.pad(lo, (0, pad)).astype(np.int32)

    def local(hi, lo, rows, stash):
        return sharded_probe_local(
            hi, lo, jnp.ones_like(hi, bool), rows[0],
            stable.max_probes, "x", kind="peptide", bucket=stable.bucket,
            shard_stash=stash[0])

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("x"), P("x"), P("x", None, None), P("x", None, None)),
        out_specs=(P("x"), P("x")), check_vma=False)
    got_v, got_f = fn(jnp.asarray(hi), jnp.asarray(lo),
                      stable.rows, stable.stash)
    got_v = np.asarray(got_v)
    got_f = np.asarray(got_f)
    assert (got_v[: len(frags)] == values).all()
    assert got_f[: len(frags)].all()
    assert not got_f[len(frags) : len(frags) + 20].any()


def _ninemer_world(rng, n=500):
    tax = Taxonomy(fixture_taxa())
    dtax = devagg.DeviceTaxonomy.from_host(tax)
    packed = np.unique(
        rng.integers(0, 2 ** 45, size=2 * n).astype(np.uint64))[:n]
    values = rng.choice(IDS, size=len(packed)).astype(np.int32)
    return tax, dtax, packed, values


def test_sharded_overflow_reroute_matches_single_chip_exact():
    """Reads with more distinct hit taxa than k_max must come out of the
    sharded path EXACT (wide reroute), matching the single-chip exact
    program — and the psum'd freq vector must be patched to match."""
    rng = np.random.default_rng(17)
    tax = Taxonomy(fixture_taxa())
    dtax = devagg.DeviceTaxonomy.from_host(tax)
    B, E, L = 16, 2, 60
    dna = rng.integers(0, 4, size=(B, E, L)).astype(np.uint8)
    lens = np.full((B, E), L, dtype=np.int32)
    # index the reads' own frame 9-mers so hits are dense and reads
    # exceed k_max=2 distinct taxa
    table_ = encoding.get_table(1)
    kms = []
    for r in range(B):
        for e in range(E):
            seq = "".join("ACGT"[c] for c in dna[r, e])
            for pep in translate.translate_sequence(
                    seq, translate.FRAME_NAMES, table_):
                kms.append(kmerops.pack_kmers_host(
                    encoding.encode_aa(pep), 9))
    packed = np.unique(np.concatenate([k for k in kms if len(k)]))
    values = rng.choice(IDS, size=len(packed)).astype(np.int32)
    table = KmerTable.build(packed, values, k=9)

    mesh = make_mesh(8)
    shards = build_sharded_tables(packed, values, k=9, n_shards=8)
    stable = ShardedTable.from_shards(shards, mesh)

    # k_max=2 with 5 candidate taxa: hit-dense reads overflow
    config = PRESETS["max-sensitivity"]._replace(k_max=2, min_seed_size=1)
    exact_cfg = config._replace(k_max=E * 6 * ((L + 2) // 3))
    single = make_pipeline(dtax, lookup.DeviceTable.from_host(table),
                           exact_cfg)
    expect = np.asarray(single(dna, lens))

    fast = make_sharded_pipeline(dtax, stable, config, mesh,
                                 with_overflow=True)
    _t, _f, over = fast(dna, lens)
    assert np.asarray(over).any(), "workload must actually overflow"

    an = ShardedAnalyser(dtax, stable, config, mesh, read_length=L, ends=E)
    got, freq = an.run(dna, lens)
    assert got.tolist() == expect.tolist()
    assert an.overflow_reads > 0

    # freq correction: recompute from the final taxa on host
    from umgap_tpu.taxonomy import NONE

    sr = np.asarray(dtax.snap_ranked)
    s = sr[np.clip(got, 0, len(sr) - 1)]
    r = np.where((got >= 0) & (got < len(sr)) & (s != NONE), s, 0)
    expect_freq = np.bincount(r, minlength=len(sr)).astype(freq.dtype)
    assert freq.tolist() == expect_freq.tolist()


def test_sharded_rmq_lca_star():
    """rmq/lca* (DeviceEuler) now runs under sharding and matches the
    single-chip program."""
    rng = np.random.default_rng(19)
    tax, dtax, packed, values = _ninemer_world(rng)
    table = KmerTable.build(packed, values, k=9)
    euler = DeviceEuler.from_host(tax)

    mesh = make_mesh(8)
    shards = build_sharded_tables(packed, values, k=9, n_shards=8)
    stable = ShardedTable.from_shards(shards, mesh)

    config = PRESETS["max-sensitivity"]._replace(
        k_max=32, method="rmq", strategy="lca*")
    B, E, L = 16, 2, 60
    dna = rng.integers(0, 4, size=(B, E, L)).astype(np.uint8)
    lens = np.full((B, E), L, dtype=np.int32)

    single = make_pipeline(dtax, lookup.DeviceTable.from_host(table),
                           config, euler=euler)
    expect = np.asarray(single(dna, lens))
    step = make_sharded_pipeline(dtax, stable, config, mesh, euler=euler)
    got, _freq = step(dna, lens)
    assert np.asarray(got).tolist() == expect.tolist()


def test_sharded_stash_hits_cross_shards():
    """Dense shards push keys into per-shard stashes; stash-resident
    keys must still resolve through the all-to-all probe."""
    rng = np.random.default_rng(23)
    # dense shards at the geometry floor (262144 slots, ~0.7 load): the
    # single-probe limit pushes bucket-overflow keys into each shard's
    # stash (capacities below bucket << MIN_NB_BITS are floored — the
    # 30-bit remainder + distance-tag invariant)
    from umgap_tpu.index.table import MIN_NB_BITS
    from umgap_tpu.parallel.sharded import owner_of

    cap = 8 << MIN_NB_BITS
    n = int(8 * cap * 0.55)
    packed = np.unique(
        rng.integers(0, 2 ** 45, size=int(1.1 * n)).astype(np.uint64))[:n]
    values = rng.integers(1, 10_000, size=len(packed)).astype(np.int32)
    hi_, lo_ = kmerops.split_packed(packed)
    owner = owner_of(hi_, lo_, 8)
    shards = [
        KmerTable.build(packed[owner == s], values[owner == s], k=9,
                        bucket=8, max_probe_limit=0, stash_cap=4096,
                        capacity=cap)
        for s in range(8)
    ]
    for t in shards:
        assert t.capacity == cap
    n_stash = sum(len(t.stash_hi) for t in shards)
    assert n_stash > 0, "need stash-resident keys for this test"

    # probe a sample that includes EVERY stash-resident key (stash
    # compares broadcast against all queries — keep the query set small)
    val_of = dict(zip(packed.tolist(), values.tolist()))
    stash_keys = np.concatenate([
        kmerops.join_packed(t.stash_hi, t.stash_lo) for t in shards
        if len(t.stash_hi)])
    sample = rng.choice(packed, size=16384, replace=False)
    packed = np.unique(np.concatenate([stash_keys, sample]))
    values = np.array([val_of[int(k)] for k in packed], dtype=np.int32)

    mesh = make_mesh(8)
    stable = ShardedTable.from_shards(shards, mesh)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from umgap_tpu.parallel.sharded import sharded_probe_local

    hi, lo = kmerops.split_packed(packed)
    pad = (-len(hi)) % 8
    hi = np.pad(hi, (0, pad)).astype(np.int32)
    lo = np.pad(lo, (0, pad)).astype(np.int32)
    valid = np.arange(len(hi)) < len(packed)

    def local(hi, lo, valid, rows, stash):
        return sharded_probe_local(
            hi, lo, valid, rows[0], stable.max_probes, "x",
            kind=stable.kind, nb_bits=stable.nb_bits, bucket=stable.bucket,
            shard_stash=stash[0])

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("x"), P("x"), P("x"), P("x", None, None),
                  P("x", None, None)),
        out_specs=(P("x"), P("x")), check_vma=False)
    got_v, got_f = fn(jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(valid),
                      stable.rows, stable.stash)
    got_v = np.asarray(got_v)[: len(packed)]
    assert np.asarray(got_f)[: len(packed)].all()
    assert (got_v == values).all()


def test_sharded_tryptic_host_chip_mesh():
    """The tryptic sharded pipeline over a 2-D (host, chip) mesh —
    collectives span the flattened product axis — matches the 1-D mesh
    result (the multi-host layout, emulated in one process)."""
    from jax.sharding import Mesh

    rng = np.random.default_rng(37)
    tax, dtax, dna, lens, frags, values = _tryptic_world(rng)
    mesh = make_mesh(8)
    shards = build_sharded_peptide_tables(frags, values, n_shards=8)
    stable = ShardedTable.from_shards(shards, mesh)
    config = TRYPTIC_PRESETS["tryptic-sensitivity"]._replace(k_max=32)
    got1, freq1 = make_sharded_tryptic_pipeline(
        dtax, stable, config, mesh)(dna, lens)

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    pmesh = Mesh(devs, ("host", "chip"))
    stable2 = ShardedTable.from_shards(shards, pmesh,
                                       axis=("host", "chip"))
    got2, freq2 = make_sharded_tryptic_pipeline(
        dtax, stable2, config, pmesh, axis=("host", "chip"))(dna, lens)
    assert np.array_equal(np.asarray(got1), np.asarray(got2))
    assert np.array_equal(np.asarray(freq1), np.asarray(freq2))
