"""Taxonomy model tests (mirrors /root/reference/src/taxon.rs:408-481)."""

import numpy as np
import pytest

from umgap_tpu import ranks
from umgap_tpu.taxonomy import (
    NONE,
    Taxon,
    Taxonomy,
    TaxonomyError,
    fixture_taxa,
    parse_taxon_line,
)


def fixture():
    return Taxonomy(fixture_taxa())


def test_parse_taxon_line():
    t = parse_taxon_line("1\tFelis catus\tspecies\t4\t\x01")
    assert t == Taxon(1, "Felis catus", ranks.rank_index("species"), 4, True)
    t = parse_taxon_line("2\tsomething\tno rank\t1\t\x00")
    assert not t.valid


def test_parse_taxon_line_errors():
    with pytest.raises(TaxonomyError):
        parse_taxon_line("1\tname\tspecies\t4")  # four fields
    with pytest.raises(TaxonomyError):
        parse_taxon_line("x\tname\tspecies\t4\t\x01")  # bad id
    with pytest.raises(TaxonomyError):
        parse_taxon_line("1\tname\tnotarank\t4\t\x01")  # bad rank
    with pytest.raises(TaxonomyError):
        parse_taxon_line("1\tname\tspecies\t4\t\x02")  # bad valid byte


def test_tree_structure():
    tax = fixture()
    assert tax.root == 1
    assert tax.depth[1] == 0
    assert tax.depth[2] == 1
    assert tax.depth[185751] == 2
    assert tax.max_depth == 2


def test_multiple_roots_raises():
    taxa = [
        Taxon(1, "a", 0, 1, True),
        Taxon(2, "b", 0, 2, True),
    ]
    with pytest.raises(TaxonomyError):
        Taxonomy(taxa)


def test_euler_tour():
    tax = fixture()
    tour, depths, first = tax.euler_tour()
    # Reference EulerIterator order (children in input order):
    assert tour.tolist() == [1, 2, 1, 10239, 1, 12884, 185751, 12884, 185752, 12884, 1]
    assert depths.tolist() == [0, 1, 0, 1, 0, 1, 2, 1, 2, 1, 0]
    assert first[1] == 0 and first[2] == 1 and first[12884] == 5
    assert first[185752] == 8


def test_snapping_valid():
    taxa = fixture_taxa()
    # invalidate 185751; it should snap to its parent 12884
    taxa[4] = Taxon(185751, "Pospiviroidae", taxa[4].rank, 12884, False)
    tax = Taxonomy(taxa)
    snap = tax.snapping(ranked_only=False)
    assert snap[185751] == 12884
    assert snap[185752] == 185752
    assert snap[1] == 1


def test_snapping_ranked():
    tax = fixture()
    snap = tax.snapping(ranked_only=True)
    # root has NoRank but is its own ancestor (src/taxon.rs:279)
    assert snap[1] == 1
    assert snap[2] == 2  # superkingdom: ranked


def test_lineage():
    tax = fixture()
    lin = tax.lineage(185751)
    S = ranks.rank_index("superkingdom")
    F = ranks.rank_index("family")
    assert lin[S] == 12884
    assert lin[F] == 185751
    assert sum(1 for x in lin if x != NONE) == 2
    with pytest.raises(TaxonomyError):
        tax.lineage(99999999)


def test_ancestor_table():
    tax = fixture()
    anc = tax.ancestor_table()
    assert anc[185751].tolist() == [1, 12884, 185751]
    assert anc[2].tolist() == [1, 2, NONE]
    assert anc[1].tolist() == [1, NONE, NONE]


def test_score():
    tax = fixture()
    # superkingdom scores 12; root (no rank, self-parent) scores None
    assert tax.score(2) == 12
    assert tax.score(1) is None
    assert tax.score(1, default=5) == 5


def test_pairwise_lca():
    tax = fixture()
    assert tax.pairwise_lca(185751, 185752) == 12884
    assert tax.pairwise_lca(2, 10239) == 1
    assert tax.pairwise_lca(12884, 185751) == 12884


def test_utils_logging_and_timer(monkeypatch, capsys):
    from umgap_tpu.utils import StageTimer, debug, device_trace, verbose

    monkeypatch.setenv("VERBOSE", "1")
    monkeypatch.delenv("DEBUG", raising=False)
    verbose("hello")
    debug("hidden")
    err = capsys.readouterr().err
    assert "hello" in err and "hidden" not in err

    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert "a" in t.report() and t.counts["a"] == 2

    with device_trace(None):  # no-op path
        pass
