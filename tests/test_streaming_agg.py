"""Streaming aggregator ports (reference src/agg/rank.rs, lineage.rs —
dead code in the reference; realized semantics reproduced)."""

from umgap_tpu.agg.streaming import LineageAggregator, RankAggregator
from umgap_tpu.taxonomy import Taxonomy, fixture_taxa


def tax():
    return Taxonomy(fixture_taxa())


def test_rank_aggregator_join():
    records = [("s1", 185751), ("s1", 185752), ("s2", 2)]
    out = list(RankAggregator(records, tax()))
    # the two families disagree at family rank -> join at 12884
    assert out == [("s1", 12884), ("s2", 2)]


def test_rank_aggregator_ancestor_on_path():
    records = [("s1", 185751), ("s1", 12884)]
    out = list(RankAggregator(records, tax()))
    # raised to superkingdom both sides agree; aggregate unchanged
    assert out == [("s1", 185751)]


def test_rank_aggregator_singletons():
    records = [("a", 2), ("b", 10239)]
    assert list(RankAggregator(records, tax())) == records


def test_lineage_aggregator_yields_nothing():
    # the reference's iterator always returns None (src/agg/lineage.rs:52-59)
    records = [("s1", 185751), ("s2", 2)]
    assert list(LineageAggregator(records, tax())) == []
