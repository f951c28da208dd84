"""Device aggregator equivalence tests vs the host oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from umgap_tpu import ranks
from umgap_tpu.agg import RmqRTL, TreeLCA, TreeMix
from umgap_tpu.agg import device as dev
from umgap_tpu.taxonomy import Taxon, Taxonomy, fixture_taxa


def random_taxonomy(rng, n=120):
    """Random tree with ids 1..n, some invalid/unranked."""
    taxa = [Taxon(1, "root", ranks.NO_RANK, 1, True)]
    for i in range(2, n + 1):
        parent = int(rng.integers(1, i))
        rank = int(rng.integers(0, ranks.RANK_COUNT))
        valid = bool(rng.random() < 0.9)
        taxa.append(Taxon(i, f"t{i}", rank, parent, valid))
    return Taxonomy(taxa)


@pytest.fixture(scope="module")
def rand_tax():
    return random_taxonomy(np.random.default_rng(7))


def make_batch(rng, tax, B, N, k_max):
    ids = np.nonzero(tax.present)[0]
    ids = ids[tax.depth[ids] != dev.NONE]
    taxa = rng.choice(ids, size=(B, N)).astype(np.int32)
    # sprinkle zeros (dropped) and duplicates
    taxa[rng.random((B, N)) < 0.3] = 0
    weights = np.ones((B, N), dtype=np.float32)
    utaxa, ucounts, uvalid = dev.dedup_counts(
        jnp.asarray(taxa), jnp.asarray(weights), k_max)
    return taxa, np.asarray(utaxa), np.asarray(ucounts), np.asarray(uvalid)


def host_counts(row):
    counts = {}
    for t in row:
        if t > 0:
            counts[int(t)] = counts.get(int(t), 0.0) + 1.0
    return counts


def test_dedup_counts(rand_tax):
    rng = np.random.default_rng(0)
    taxa, utaxa, ucounts, uvalid = make_batch(rng, rand_tax, 16, 24, 24)
    for b in range(16):
        expect = host_counts(taxa[b])
        got = {
            int(t): float(c)
            for t, c, v in zip(utaxa[b], ucounts[b], uvalid[b]) if v
        }
        assert got == expect


@pytest.mark.parametrize("strategy,factor", [
    ("lca*", 0.0), ("hybrid", 0.0), ("hybrid", 0.25), ("hybrid", 0.5),
    ("hybrid", 1.0), ("mrtl", 0.0),
])
def test_device_matches_host(rand_tax, strategy, factor):
    rng = np.random.default_rng(hash(strategy) % 2 ** 31 + int(factor * 4))
    tax = rand_tax
    dtax = dev.DeviceTaxonomy.from_host(tax)
    B, N, K = 48, 20, 20
    taxa, utaxa, ucounts, uvalid = make_batch(rng, tax, B, N, K)
    method = "rmq" if strategy == "mrtl" else "tree"
    out = np.asarray(dev.aggregate_batch(
        dtax, jnp.asarray(utaxa), jnp.asarray(ucounts), jnp.asarray(uvalid),
        method, strategy, factor))
    if strategy == "lca*":
        host = TreeLCA(tax)
    elif strategy == "hybrid":
        host = TreeMix(tax, factor)
    else:
        host = RmqRTL(tax)
    for b in range(B):
        counts = host_counts(taxa[b])
        if not counts:
            continue
        expect = host.aggregate(counts)
        assert out[b] == expect, (strategy, factor, b, sorted(counts.items()))


def test_device_matches_host_fixture():
    tax = Taxonomy(fixture_taxa())
    dtax = dev.DeviceTaxonomy.from_host(tax)
    cases = [
        [12884, 185752], [185751, 185752], [2, 10239],
        [12884, 185751, 185752, 185752], [1, 1, 10239, 10239, 12884, 185751],
    ]
    N = 8
    taxa = np.zeros((len(cases), N), dtype=np.int32)
    for i, c in enumerate(cases):
        taxa[i, : len(c)] = c
    w = np.ones_like(taxa, dtype=np.float32)
    utaxa, ucounts, uvalid = dev.dedup_counts(jnp.asarray(taxa), jnp.asarray(w), N)
    for strategy, factor, host in [
        ("lca*", 0.0, TreeLCA(tax)),
        ("hybrid", 0.25, TreeMix(tax, 0.25)),
        ("mrtl", 0.0, RmqRTL(tax)),
    ]:
        method = "rmq" if strategy == "mrtl" else "tree"
        out = np.asarray(dev.aggregate_batch(
            dtax, utaxa, ucounts, uvalid, method, strategy, factor))
        for i, c in enumerate(cases):
            assert out[i] == host.aggregate(host_counts(c)), (strategy, c)


def test_snap_batch():
    tax = Taxonomy(fixture_taxa())
    dtax = dev.DeviceTaxonomy.from_host(tax)
    taxa = jnp.asarray([185751, 1, 99999, -1])
    out = np.asarray(dev.snap_batch(dtax.snap_valid, taxa))
    assert out[0] == 185751 and out[1] == 1
    assert out[2] == 0 and out[3] == 0


def test_filter_lower_bound():
    u = jnp.asarray([[5, 6, dev.I32_MAX]])
    c = jnp.asarray([[2.0, 1.0, 0.0]])
    v = jnp.asarray([[True, True, False]])
    kept = np.asarray(dev.filter_lower_bound(c, v, 2.0))
    assert kept.tolist() == [[True, False, False]]


def test_rmq_lca_filtered_first_slot_with_taxon_zero():
    """Regression: a lower-bound-filtered slot 0 plus a REAL taxon id 0
    in the taxonomy must not corrupt the rmq/lca* walk (the seed is now
    the first VALID slot)."""
    from umgap_tpu import ranks
    from umgap_tpu.agg.device_rmq import DeviceEuler, rmq_lca_batch
    from umgap_tpu.agg.host import RmqLCA, count
    from umgap_tpu.taxonomy import Taxon, Taxonomy

    S = ranks.rank_index("superkingdom")
    taxa = [
        Taxon(0, "zero", S, 1, True),
        Taxon(1, "root", ranks.NO_RANK, 1, True),
        Taxon(2, "B", S, 1, True),
        Taxon(3, "c", S, 2, True),
        Taxon(4, "d", S, 2, True),
    ]
    tax = Taxonomy(taxa)
    euler = DeviceEuler.from_host(tax)

    # hits {3: 1, 4: 2}, lower_bound 2 -> slot 0 (taxon 3) filtered
    utaxa = np.array([[3, 4]], np.int32)
    ucounts = np.array([[1.0, 2.0]], np.float32)
    uvalid = ucounts >= 2.0
    got = int(np.asarray(rmq_lca_batch(euler, utaxa, uvalid))[0])
    expect = RmqLCA(tax).aggregate(count(iter([(4, 1.0)])))
    assert got == expect == 4


def test_pack_windows_shorter_than_k():
    """Peptide axis shorter than k: no crash, no valid windows."""
    from umgap_tpu.ops import kmers as kmerops

    aa = jnp.zeros((2, 5), jnp.uint8)
    plens = jnp.array([5, 3], jnp.int32)
    hi, lo, valid = kmerops.pack_windows_batch(aa, plens, 9)
    assert not bool(np.asarray(valid).any())
