"""Seed-extend tests: host transliteration + device scan equivalence."""

import numpy as np
import pytest

from umgap_tpu.ops.seedextend import (
    apply_seedextend,
    seedextend_host,
    seedextend_mask_batch,
    select_best_seed,
)
from umgap_tpu.taxonomy import Taxonomy, fixture_taxa


def test_doc_example():
    # from the command doc (src/commands/seedextend.rs:29-50): default -s2 -g0
    frames = {
        "1": [9606, 9606, 2759, 9606, 9606, 9606, 9606, 9606, 9606, 9606, 8287],
        "2": [2026807, 888268, 186802, 1598, 1883],
        "3": [1883],
        "1R": [27342, 2759, 155619, 1133106, 38033, 2],
        "2R": [],
        "3R": [2951],
    }
    expected = {
        "1": frames["1"],
        "2": [], "3": [], "1R": [], "2R": [], "3R": [],
    }
    for name, taxa in frames.items():
        assert apply_seedextend(taxa, 2, 0) == expected[name], name


def test_simple_seed():
    # a seed extends over neighbouring single taxa (hence "seed-extend")
    assert apply_seedextend([5, 5, 3], 2, 0) == [5, 5, 3]
    assert apply_seedextend([3, 5, 5], 2, 0) == [3, 5, 5]
    assert apply_seedextend([3, 4, 6], 2, 0) == []


def test_gap_handling():
    # gap of 1 joined when g>=1, broken when g=0
    assert apply_seedextend([5, 5, 0, 6, 6], 2, 1) == [5, 5, 0, 6, 6]
    assert apply_seedextend([5, 5, 0, 6, 6], 2, 0) == [5, 5, 6, 6]
    # trailing gap trimmed
    assert apply_seedextend([5, 5, 0], 2, 1) == [5, 5]
    # leading gap never starts a seed (g=0 resets)
    assert apply_seedextend([0, 5, 5], 2, 0) == [5, 5]


def test_leading_gap_quirk():
    # realized reference behavior with g>=1: a leading gap swallows the
    # next element (src/commands/seedextend.rs:122-127)
    assert apply_seedextend([0, 5, 5, 5], 2, 1) == [5, 5]  # first 5 dropped
    # after the swallow only one 5 remains -> run too short, nothing kept
    assert apply_seedextend([0, 5, 5], 2, 1) == []


def test_scored_mode():
    tax = Taxonomy(fixture_taxa())
    taxa = [2, 2, 0, 0, 0, 185751, 185751, 185751]
    seeds = seedextend_host(taxa, 2, 0)
    assert seeds == [(0, 2), (5, 8)]
    best = select_best_seed(taxa, seeds, tax, penalty=5)
    # scores: [2,2] = 24; [185751 x3] = 36 -> second wins
    assert best == [(5, 8)]


def test_device_mask_matches_host():
    rng = np.random.default_rng(42)
    B, N = 64, 40
    for s in (1, 2, 3, 4):
        for g in (0, 1, 2):
            taxa = rng.integers(0, 4, size=(B, N)).astype(np.int32)
            # make zeros common
            taxa[rng.random((B, N)) < 0.4] = 0
            lengths = rng.integers(0, N + 1, size=B).astype(np.int32)
            for i in range(B):
                taxa[i, lengths[i]:] = 0
            keep = np.asarray(seedextend_mask_batch(taxa, lengths, s, g))
            for i in range(B):
                row = taxa[i, : lengths[i]].tolist()
                seeds = seedextend_host(row, s, g)
                expect = np.zeros(N, dtype=bool)
                for (a, b) in seeds:
                    expect[a:b] = True
                assert keep[i].tolist() == expect.tolist(), (s, g, row)
