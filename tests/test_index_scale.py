"""At-scale joinkmers (index/scale.py) vs the streaming reference port."""

import numpy as np
import pytest

from umgap_tpu import ranks
from umgap_tpu.index.build import join_kmers
from umgap_tpu.index.scale import join_kmers_sorted
from umgap_tpu.ops import kmers as kmerops
from umgap_tpu.taxonomy import Taxon, Taxonomy


@pytest.fixture(scope="module")
def tax():
    rng = np.random.default_rng(5)
    taxa = [Taxon(1, "root", ranks.NO_RANK, 1, True)]
    for i in range(2, 3001):
        parent = int(rng.integers(1, i))
        rank = int(rng.integers(0, ranks.RANK_COUNT))
        valid = bool(rng.random() > 0.15)
        taxa.append(Taxon(i, f"t{i}", rank, parent, valid))
    return Taxonomy(taxa)


def _random_rows(rng, n_keys, n_rows, n_tax):
    keys = np.sort(rng.integers(0, 2 ** 45, size=n_keys, dtype=np.uint64))
    which = np.sort(rng.integers(0, n_keys, size=n_rows))
    packed = keys[which]
    # mix of heavy duplication and wide groups
    tids = rng.integers(1, n_tax + 1, size=n_rows).astype(np.int64)
    dup = rng.random(n_rows) < 0.4
    tids[dup] = rng.integers(1, 50, size=int(dup.sum()))
    return packed, tids


def test_matches_streaming_join(tax):
    rng = np.random.default_rng(11)
    packed, tids = _random_rows(rng, 300, 4000, 3000)

    keys, values = join_kmers_sorted(packed, tids, tax, group_cap=64)

    # streaming oracle: decode keys as strings for the reference port
    def rows():
        for p, t in zip(packed, tids):
            yield kmerops.unpack_kmer(int(p), 9), int(t)

    expected = {}
    for kmer, taxon, _rank in join_kmers(rows(), tax):
        expected[kmer] = taxon

    got = {kmerops.unpack_kmer(int(k), 9): int(v) for k, v in
           zip(keys, values)}
    assert got == expected


def test_singleton_fast_path(tax):
    packed = np.array([10, 10, 10, 42], dtype=np.uint64)
    tids = np.array([7, 7, 7, 2], dtype=np.int64)
    keys, values = join_kmers_sorted(packed, tids, tax)
    ranksnap = tax.snapping(ranked_only=True)
    validsnap = tax.snapping(ranked_only=False)
    assert list(keys) == [10, 42]
    assert values[0] == ranksnap[validsnap[7]]
    assert values[1] == ranksnap[validsnap[2]]


def test_empty_and_all_invalid(tax):
    keys, values = join_kmers_sorted(
        np.zeros(0, np.uint64), np.zeros(0, np.int64), tax)
    assert len(keys) == 0
    # tids out of range are dropped entirely
    keys, values = join_kmers_sorted(
        np.array([5, 5], dtype=np.uint64),
        np.array([999999, -3], dtype=np.int64), tax)
    assert len(keys) == 0


def test_native_matches_numpy(tax):
    from umgap_tpu.io import native as nat

    if not nat.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(21)
    packed, tids = _random_rows(rng, 500, 8000, 3000)
    nk, nv = join_kmers_sorted(packed, tids, tax, use_native=True)
    pk, pv = join_kmers_sorted(packed, tids, tax, group_cap=64,
                               use_native=False)
    assert np.array_equal(nk, pk)
    assert np.array_equal(nv, pv)


def test_wide_groups_beyond_cap_are_exact(tax, capsys):
    """Groups with more distinct taxa than group_cap must aggregate
    EXACTLY (dynamic wide bucket + logged note), matching the streaming
    oracle — previously they silently produced value 0."""
    rng = np.random.default_rng(29)
    # one group with 30 distinct taxa (> cap 8), plus normal groups
    wide_key = np.uint64(12345)
    packed = np.concatenate([
        np.full(60, wide_key, dtype=np.uint64),
        np.sort(rng.integers(2 ** 20, 2 ** 45, size=200, dtype=np.uint64)),
    ])
    tids = np.concatenate([
        np.repeat(rng.choice(np.arange(2, 3001), size=30, replace=False), 2),
        rng.integers(1, 3001, size=200),
    ]).astype(np.int64)
    order = np.argsort(packed, kind="stable")
    packed, tids = packed[order], tids[order]

    keys, values = join_kmers_sorted(packed, tids, tax, group_cap=8,
                                     use_native=False)
    err = capsys.readouterr().err
    assert "exceed group_cap=8" in err

    def rows():
        for p, t in zip(packed, tids):
            yield kmerops.unpack_kmer(int(p), 9), int(t)

    expected = {}
    for kmer, taxon, _rank in join_kmers(rows(), tax):
        expected[kmer] = taxon
    got = {kmerops.unpack_kmer(int(k), 9): int(v) for k, v in
           zip(keys, values)}
    assert got == expected
