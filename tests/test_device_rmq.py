"""Device RMQ-LCA and RMQ-hybrid equivalence vs host oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from umgap_tpu import ranks
from umgap_tpu.agg import RmqLCA, RmqMix
from umgap_tpu.agg import device as dev
from umgap_tpu.agg.device_rmq import (
    DeviceEuler,
    rmq_lca_batch,
    rmq_mix_batch,
    rmq_query_batch,
)
from umgap_tpu.agg.rmq import RMQ
from umgap_tpu.taxonomy import Taxon, Taxonomy, fixture_taxa


def random_taxonomy(rng, n=100):
    taxa = [Taxon(1, "root", ranks.NO_RANK, 1, True)]
    for i in range(2, n + 1):
        parent = int(rng.integers(1, i))
        rank = int(rng.integers(0, ranks.RANK_COUNT))
        taxa.append(Taxon(i, f"t{i}", rank, parent, True))
    return Taxonomy(taxa)


def test_rmq_query_batch_matches_host():
    rng = np.random.default_rng(2)
    tax = random_taxonomy(rng, 150)
    tour, depths, first = tax.euler_tour()
    host = RMQ(depths)
    euler = DeviceEuler.from_host(tax)
    T = len(tour)
    a = rng.integers(0, T, size=256).astype(np.int32)
    b = rng.integers(0, T, size=256).astype(np.int32)
    got = np.asarray(rmq_query_batch(euler, jnp.asarray(a), jnp.asarray(b)))
    for i in range(256):
        assert got[i] == host.query(int(a[i]), int(b[i])), (a[i], b[i])


def _batches(rng, tax, B, N):
    ids = np.nonzero(tax.present)[0]
    ids = ids[tax.depth[ids] != dev.NONE]
    taxa = rng.choice(ids, size=(B, N)).astype(np.int32)
    taxa[rng.random((B, N)) < 0.3] = 0
    w = np.ones((B, N), dtype=np.float32)
    utaxa, ucounts, uvalid = dev.dedup_counts(
        jnp.asarray(taxa), jnp.asarray(w), N)
    return taxa, utaxa, ucounts, uvalid


def host_counts_sorted(row):
    counts = {}
    for t in sorted(row):
        if t > 0:
            counts[int(t)] = counts.get(int(t), 0.0) + 1.0
    return counts


def test_rmq_lca_device_matches_host():
    rng = np.random.default_rng(3)
    tax = random_taxonomy(rng, 120)
    euler = DeviceEuler.from_host(tax)
    host = RmqLCA(tax)
    taxa, utaxa, ucounts, uvalid = _batches(rng, tax, 64, 16)
    out = np.asarray(rmq_lca_batch(euler, utaxa, uvalid))
    for b in range(64):
        counts = host_counts_sorted(taxa[b])
        if not counts:
            continue
        assert out[b] == host.aggregate(counts), (b, sorted(counts))


def test_rmq_lca_device_fixture():
    tax = Taxonomy(fixture_taxa())
    euler = DeviceEuler.from_host(tax)
    cases = [([12884, 185752], 185752), ([185751, 185752], 12884),
             ([2, 10239], 1), ([12884, 185751, 185752], 12884),
             ([1, 2], 2)]
    N = 6
    taxa = np.zeros((len(cases), N), np.int32)
    for i, (c, _) in enumerate(cases):
        taxa[i, : len(c)] = c
    utaxa, ucounts, uvalid = dev.dedup_counts(
        jnp.asarray(taxa), jnp.ones((len(cases), N), jnp.float32), N)
    out = np.asarray(rmq_lca_batch(euler, utaxa, uvalid))
    for i, (c, expect) in enumerate(cases):
        assert out[i] == expect, c


@pytest.mark.parametrize("factor", [0.0, 0.5, 1.0])
def test_rmq_mix_device_matches_host(factor):
    rng = np.random.default_rng(4 + int(factor * 2))
    tax = random_taxonomy(rng, 80)
    dtax = dev.DeviceTaxonomy.from_host(tax)
    host = RmqMix(tax, factor)
    taxa, utaxa, ucounts, uvalid = _batches(rng, tax, 32, 12)
    out = np.asarray(rmq_mix_batch(dtax, utaxa, ucounts, uvalid, factor))
    for b in range(32):
        counts = host_counts_sorted(taxa[b])
        if not counts:
            continue
        assert out[b] == host.aggregate(counts), (factor, b, sorted(counts))
