"""Host aggregator tests.

Expected values transliterated from the reference unit suites:
/root/reference/src/tree/lca.rs:43-78, src/tree/mix.rs:67-98,
src/rmq/lca.rs:93-164, src/rmq/rtl.rs:60-93, src/rmq/mix.rs:96-127,
src/agg/mod.rs:67-118.
"""

import pytest

from umgap_tpu import ranks
from umgap_tpu.agg import (
    EmptyInputError,
    RmqLCA,
    RmqMix,
    RmqRTL,
    TreeLCA,
    TreeMix,
    UnknownTaxonError,
    count,
    filter_counts,
    make_aggregator,
)
from umgap_tpu.taxonomy import Taxon, Taxonomy, fixture_taxa


@pytest.fixture(scope="module")
def tax():
    return Taxonomy(fixture_taxa())


def all_aggregators(tax):
    return [
        RmqLCA(tax),
        RmqRTL(tax),
        RmqMix(tax, 0.0),
        RmqMix(tax, 1.0),
        RmqMix(tax, 0.5),
        TreeLCA(tax),
        TreeMix(tax, 0.0),
        TreeMix(tax, 1.0),
        TreeMix(tax, 0.5),
    ]


# -- shared invariants (src/agg/mod.rs:79-118) -------------------------- #

def test_empty_query(tax):
    for agg in all_aggregators(tax):
        with pytest.raises(EmptyInputError):
            agg.counting_aggregate([])


def test_singleton_is_singleton(tax):
    for agg in all_aggregators(tax):
        for t in (1, 2, 10239, 12884, 185751, 185752):
            assert agg.counting_aggregate([t]) == t, type(agg).__name__


def test_invalid_taxa(tax):
    for agg in all_aggregators(tax):
        with pytest.raises(UnknownTaxonError):
            agg.counting_aggregate([5])
        with pytest.raises(UnknownTaxonError):
            agg.counting_aggregate([1, 2, 5, 1])


# -- tree::lca (src/tree/lca.rs:43-78) ---------------------------------- #

def test_tree_lca_two_on_same_path(tax):
    agg = TreeLCA(tax)
    assert agg.counting_aggregate([12884, 185752]) == 185752
    assert agg.counting_aggregate([185752, 12884]) == 185752
    assert agg.counting_aggregate([1, 2]) == 2
    assert agg.counting_aggregate([2, 1]) == 2


def test_tree_lca_two_on_fork(tax):
    agg = TreeLCA(tax)
    assert agg.counting_aggregate([2, 10239]) == 1
    assert agg.counting_aggregate([10239, 2]) == 1
    assert agg.counting_aggregate([185751, 185752]) == 12884
    assert agg.counting_aggregate([185752, 185751]) == 12884


def test_tree_lca_three_on_triangle(tax):
    agg = TreeLCA(tax)
    for order in ([12884, 185751, 185752], [12884, 185752, 185751],
                  [185751, 12884, 185752], [185752, 12884, 185751],
                  [185751, 185752, 12884], [185752, 185751, 12884]):
        assert agg.counting_aggregate(order) == 12884


# -- tree::mix (src/tree/mix.rs:67-98) ---------------------------------- #

def test_tree_mix_full_rtl(tax):
    agg = TreeMix(tax, 0.0)
    assert agg.counting_aggregate([12884, 185751]) == 185751
    assert agg.counting_aggregate([12884, 185751, 185752, 185752]) == 185752
    assert agg.counting_aggregate(
        [1, 1, 10239, 10239, 12884, 185751, 185752]) in (185751, 185752)


def test_tree_mix_full_lca(tax):
    agg = TreeMix(tax, 1.0)
    assert agg.counting_aggregate([12884, 185751]) == 185751
    assert agg.counting_aggregate([12884, 185751, 185752, 185752]) == 12884
    assert agg.counting_aggregate(
        [1, 1, 10239, 10239, 10239, 12884, 185751, 185752]) == 1


def test_tree_mix_two_thirds(tax):
    agg = TreeMix(tax, 0.66)
    assert agg.counting_aggregate([12884, 185751]) == 185751
    assert agg.counting_aggregate([1, 12884, 12884, 185751]) == 185751
    assert agg.counting_aggregate(
        [1, 12884, 10239, 185751, 185751, 185752]) == 12884


# -- rmq::lca (src/rmq/lca.rs:93-164) ----------------------------------- #

def test_rmq_lca_two_on_same_path(tax):
    agg = RmqLCA(tax)
    assert agg.counting_aggregate([12884, 185752]) == 185752
    assert agg.counting_aggregate([185752, 12884]) == 185752
    assert agg.counting_aggregate([1, 2]) == 2
    assert agg.counting_aggregate([2, 1]) == 2


def test_rmq_lca_two_on_fork(tax):
    agg = RmqLCA(tax)
    assert agg.counting_aggregate([2, 10239]) == 1
    assert agg.counting_aggregate([10239, 2]) == 1
    assert agg.counting_aggregate([185751, 185752]) == 12884
    assert agg.counting_aggregate([185752, 185751]) == 12884


def test_rmq_lca_three_on_triangle(tax):
    agg = RmqLCA(tax)
    for order in ([12884, 185751, 185752], [12884, 185752, 185751],
                  [185751, 12884, 185752], [185752, 12884, 185751],
                  [185751, 185752, 12884], [185752, 185751, 12884]):
        assert agg.counting_aggregate(order) == 12884


def large_taxonomy():
    """15-node tree from src/rmq/lca.rs:113-133."""
    N = ranks.NO_RANK
    edges = [(1, 1), (2, 1), (5, 2), (6, 2), (3, 1), (7, 3), (10, 7),
             (13, 10), (14, 13), (15, 3), (8, 3), (11, 8), (12, 8),
             (9, 3), (4, 1)]
    return Taxonomy([Taxon(i, "", N, p, True) for i, p in edges])


def test_rmq_lca_with_deeper_interns():
    agg = RmqLCA(large_taxonomy())
    assert agg.counting_aggregate([9, 7]) == 3
    assert agg.counting_aggregate([9, 10]) == 3
    assert agg.counting_aggregate([7, 9]) == 3
    assert agg.counting_aggregate([14, 8]) == 3


# -- rmq::rtl (src/rmq/rtl.rs:60-93) ------------------------------------ #

def test_rtl_all_on_same_path(tax):
    agg = RmqRTL(tax)
    assert agg.counting_aggregate([1]) == 1
    assert agg.counting_aggregate([1, 12884]) == 12884
    assert agg.counting_aggregate([1, 12884, 185751]) == 185751


def test_rtl_favouring_root(tax):
    agg = RmqRTL(tax)
    assert agg.counting_aggregate([1, 1, 1, 185751, 1, 1]) == 185751


def test_rtl_leaning_close(tax):
    agg = RmqRTL(tax)
    assert agg.counting_aggregate([1, 1, 185752, 185751, 185751, 1]) == 185751


def test_rtl_tie(tax):
    agg = RmqRTL(tax)
    # nondeterministic in the reference; ours picks the smaller id
    assert agg.counting_aggregate([1, 1, 185752, 185751, 1]) in (185751, 185752)


# -- rmq::mix (src/rmq/mix.rs:96-127) ----------------------------------- #

def test_rmq_mix_full_rtl(tax):
    agg = RmqMix(tax, 0.0)
    assert agg.counting_aggregate([12884, 185751]) == 185751
    assert agg.counting_aggregate([12884, 185751, 185752, 185752]) == 185752
    assert agg.counting_aggregate(
        [1, 1, 10239, 10239, 10239, 12884, 185751, 185752]) == 10239


def test_rmq_mix_full_lca(tax):
    agg = RmqMix(tax, 1.0)
    assert agg.counting_aggregate([12884, 185751]) == 12884
    assert agg.counting_aggregate([12884, 185751, 185752, 185752]) == 12884
    assert agg.counting_aggregate(
        [1, 1, 10239, 10239, 10239, 12884, 185751, 185752]) == 1


def test_rmq_mix_one_half(tax):
    agg = RmqMix(tax, 0.5)
    assert agg.counting_aggregate([12884, 12884, 185751]) == 12884
    assert agg.counting_aggregate([12884, 185751, 185751]) == 185751
    # third reference example is an acknowledged score tie: 12884 vs 185751
    assert agg.counting_aggregate(
        [1, 12884, 12884, 185751, 185752]) in (12884, 185751)


# -- helpers ------------------------------------------------------------ #

def test_count_and_filter():
    c = count([(1, 1.0), (2, 1.0), (1, 1.0)])
    assert c == {1: 2.0, 2: 1.0}
    assert filter_counts(c, 2.0) == {1: 2.0}


def test_make_aggregator_dispatch(tax):
    assert isinstance(make_aggregator(tax, "rmq", "mrtl"), RmqRTL)
    assert isinstance(make_aggregator(tax, "rmq", "lca*"), RmqLCA)
    assert isinstance(make_aggregator(tax, "rmq", "hybrid"), RmqMix)
    assert isinstance(make_aggregator(tax, "tree", "lca*"), TreeLCA)
    assert isinstance(make_aggregator(tax, "tree", "hybrid"), TreeMix)
    with pytest.raises(ValueError):
        make_aggregator(tax, "tree", "mrtl")
