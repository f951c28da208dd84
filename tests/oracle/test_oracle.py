"""Validates the parity oracle against the reference's own unit tests.

Every expected value below is transliterated from a `#[cfg(test)]`
module or a doc example in /root/reference/src — these are the
reference's own assertions, reused as ground truth for the oracle.
"""

import pytest

from . import refimpl as R

# src/fixtures.rs:4-21
FIXTURE_TSV = (
    "1\troot\tno rank\t1\t\x01\n"
    "2\tBacteria\tsuperkingdom\t1\t\x01\n"
    "10239\tViruses\tsuperkingdom\t1\t\x01\n"
    "12884\tViroids\tsuperkingdom\t1\t\x01\n"
    "185751\tPospiviroidae\tfamily\t12884\t\x01\n"
    "185752\tAvsunviroidae\tfamily\t12884\t\x01\n"
)


@pytest.fixture(scope="module")
def taxa():
    return R.read_taxa(FIXTURE_TSV)


@pytest.fixture(scope="module")
def tree(taxa):
    return R.TaxonTree(taxa)


@pytest.fixture(scope="module")
def by_id(taxa):
    return R.TaxonList(taxa)


def counting(agg, tids):
    return agg.aggregate(R.agg_count((t, 1.0) for t in tids))


# ------------------------------------------------------------------ #
# taxon (src/taxon.rs:408-481)
# ------------------------------------------------------------------ #

def test_taxon_parsing():
    t = R.parse_taxon_line("1\troot\tno rank\t1\t\x01")
    assert (t.id, t.name, t.rank, t.parent, t.valid) == (1, "root", 0, 1, True)
    t = R.parse_taxon_line("1\troot\tfamily\t1\t\x01")
    assert t.rank == R.parse_rank("family")
    t = R.parse_taxon_line("1\troot\tno rank\t22\t\x01")
    assert t.parent == 22
    t = R.parse_taxon_line("1\troot\tno rank\t1\t\x00")
    assert not t.valid
    for bad in ["hello world", "a\troot\tno_rank\t1\t\x00",
                "1\troot\tno_rank\t1\t\x00", "1\troot\tno rank\t#\t\x00",
                "1\troot\tno rank\t\t\x00", "1\troot\tno rank\t7\thello"]:
        with pytest.raises((R.OracleError, ValueError)):
            R.parse_taxon_line(bad)


def test_euler_tour(tree):
    # src/taxon.rs:431-446
    assert tree.euler_tour() == [
        (1, 0), (2, 1),
        (1, 0), (10239, 1),
        (1, 0), (12884, 1), (185751, 2),
                (12884, 1), (185752, 2),
                (12884, 1),
        (1, 0),
    ]


def test_taxon_list(by_id):
    anc = by_id.ancestry()
    assert anc[1] == 1 and anc[2] == 1 and anc[10239] == 1
    assert anc[12884] == 1 and anc[185751] == 12884 and anc[185752] == 12884
    assert anc[3] is None


def test_lineage(by_id):
    lineage = by_id.lineage(185751)
    sk = R.parse_rank("superkingdom")
    fam = R.parse_rank("family")
    for r in range(1, R.RANK_COUNT):
        if r == sk:
            assert lineage[r].id == 12884
        elif r == fam:
            assert lineage[r].id == 185751
        else:
            assert lineage[r] is None


# ------------------------------------------------------------------ #
# RMQ (src/rmq/mod.rs:159-282) — 64-bit usize branch
# ------------------------------------------------------------------ #

RMQ_ARRAY_34 = [12, 17, 23, 2, 20, 4, 8, 27, 26, 19, 31, 22, 28, 16, 24, 14,
                5, 29, 32, 11, 7, 9, 25, 30, 21, 13, 6, 18, 15, 33, 10, 3,
                33, 1]


def test_block_minima():
    # size()==64 branch of src/rmq/mod.rs:163-168
    assert R.RMQ._block_min(RMQ_ARRAY_34) == [33]


def _array200():
    base = [39, 60, 15, 94, 25, 3, 88, 94, 71, 68,
            17, 15, 73, 32, 59, 89, 25, 36, 12, 85,
            80, 94, 56, 30, 62, 3, 10, 58, 69, 56,
            10, 8, 48, 25, 34, 5, 61, 22, 99, 64,
            22, 49, 80, 28, 13, 71, 17, 38, 40, 61,
            55, 20, 55, 43, 82, 49, 78, 24, 8, 47,
            12, 50, 87, 61, 8, 21, 66, 69, 76, 66,
            65, 98, 47, 77, 58, 60, 81, 76, 98, 21,
            69, 85, 73, 25, 29, 88, 74, 7, 12, 14,
            87, 25, 97, 74, 86, 5, 28, 84, 6, 4]
    return base + base


def test_rmq_queries():
    info = R.RMQ(_array200())
    assert info.query(0, 9) == 5
    assert info.query(10, 19) == 18
    assert info.query(0, 39) == 5
    assert info.query(0, 69) == 5
    assert info.query(40, 99) == 99
    assert info.query(0, 99) == 5
    assert info.query(10, 99) == 25
    assert info.query(30, 99) == 99
    assert info.query(30, 140) == 105


def test_wave_arrays():
    wave33 = [1, 2] + [3, 4] * 31 + [3, 2, 1]
    info = R.RMQ(wave33)
    assert info.query(2, 64) == 2
    wave65 = [1, 2] + [3, 4] * 82 + [3, 2, 1]
    info = R.RMQ(wave65)
    assert info.query(2, 64) == 2


# ------------------------------------------------------------------ #
# aggregators
# ------------------------------------------------------------------ #

def test_rmq_lca_aggregate(tree):
    agg = R.RmqLCACalculator(tree)
    assert counting(agg, [12884, 185752]) == 185752
    assert counting(agg, [185752, 12884]) == 185752
    assert counting(agg, [1, 2]) == 2
    assert counting(agg, [2, 10239]) == 1
    assert counting(agg, [185751, 185752]) == 12884
    for perm in ([12884, 185751, 185752], [185752, 12884, 185751],
                 [185751, 185752, 12884]):
        assert counting(agg, perm) == 12884


def test_rmq_lca_deeper_interns():
    # src/rmq/lca.rs:135-163 large_taxon_list
    rows = [(1, 1), (2, 1), (5, 2), (6, 2), (3, 1), (7, 3), (10, 7),
            (13, 10), (14, 13), (15, 3), (8, 3), (11, 8), (12, 8),
            (9, 3), (4, 1)]
    tsv = "".join(f"{i}\tt\tno rank\t{p}\t\x01\n" for i, p in rows)
    agg = R.RmqLCACalculator(R.TaxonTree(R.read_taxa(tsv)))
    assert counting(agg, [9, 7]) == 3
    assert counting(agg, [9, 10]) == 3
    assert counting(agg, [7, 9]) == 3
    assert counting(agg, [14, 8]) == 3


def test_rtl(tree, by_id):
    agg = R.RTLCalculator(tree.root, by_id)
    # src/rmq/rtl.rs tests (deterministic cases)
    assert counting(agg, [12884, 185751]) == 185751
    assert counting(agg, [12884, 185751, 185752, 185752]) == 185752


def test_rmq_mix(tree):
    # src/rmq/mix.rs:96-127
    agg = R.RmqMixCalculator(tree, 0.0)
    assert counting(agg, [12884, 185751]) == 185751
    assert counting(agg, [12884, 185751, 185752, 185752]) == 185752
    assert counting(agg, [1, 1, 10239, 10239, 10239, 12884, 185751, 185752]) == 10239

    agg = R.RmqMixCalculator(tree, 1.0)
    assert counting(agg, [12884, 185751]) == 12884
    assert counting(agg, [12884, 185751, 185752, 185752]) == 12884
    assert counting(agg, [1, 1, 10239, 10239, 10239, 12884, 185751, 185752]) == 1

    agg = R.RmqMixCalculator(tree, 0.5)
    assert counting(agg, [12884, 12884, 185751]) == 12884
    assert counting(agg, [12884, 185751, 185751]) == 185751
    assert counting(agg, [1, 12884, 12884, 185751, 185752]) == 12884


def test_tree_lca(tree, by_id):
    # src/tree/lca.rs:43-78
    agg = R.TreeLCACalculator(tree.root, by_id)
    assert counting(agg, [12884, 185752]) == 185752
    assert counting(agg, [1, 2]) == 2
    assert counting(agg, [2, 10239]) == 1
    assert counting(agg, [185751, 185752]) == 12884
    assert counting(agg, [12884, 185751, 185752]) == 12884


def test_tree_mix(tree, by_id):
    # src/tree/mix.rs:67-98
    agg = R.TreeMixCalculator(tree.root, by_id, 0.0)
    assert counting(agg, [12884, 185751]) == 185751
    assert counting(agg, [12884, 185751, 185752, 185752]) == 185752

    agg = R.TreeMixCalculator(tree.root, by_id, 1.0)
    assert counting(agg, [12884, 185751]) == 185751
    assert counting(agg, [12884, 185751, 185752, 185752]) == 12884
    assert counting(agg, [1, 1, 10239, 10239, 10239, 12884, 185751, 185752]) == 1

    agg = R.TreeMixCalculator(tree.root, by_id, 0.66)
    assert counting(agg, [12884, 185751]) == 185751
    assert counting(agg, [1, 12884, 12884, 185751]) == 185751
    assert counting(agg, [1, 12884, 10239, 185751, 185751, 185752]) == 12884


def test_aggregators_common(tree, by_id):
    # src/agg/mod.rs:67-118 cross-aggregator invariants
    aggs = [
        R.RmqLCACalculator(tree),
        R.RTLCalculator(tree.root, by_id),
        R.RmqMixCalculator(tree, 0.0),
        R.RmqMixCalculator(tree, 1.0),
        R.RmqMixCalculator(tree, 0.5),
        R.TreeLCACalculator(tree.root, by_id),
        R.TreeMixCalculator(tree.root, by_id, 0.0),
        R.TreeMixCalculator(tree.root, by_id, 1.0),
        R.TreeMixCalculator(tree.root, by_id, 0.5),
    ]
    for agg in aggs:
        with pytest.raises(R.EmptyInput):
            counting(agg, [])
        for tid in [1, 2, 10239, 12884, 185751, 185752]:
            assert counting(agg, [tid]) == tid
        with pytest.raises(R.OracleError):
            counting(agg, [5])
        with pytest.raises(R.OracleError):
            counting(agg, [1, 2, 5, 1])


# ------------------------------------------------------------------ #
# dna / translation (src/dna/translation.rs doc + translate.rs docs)
# ------------------------------------------------------------------ #

def test_translate_basic():
    out = R.translate(">header1\nGATTACAAA\n", frames=["1"])
    assert out == ">header1\nDYK\n"
    out = R.translate(">header1\nGATTACAAA\n", frames=["1", "1R"], append_name=True)
    assert out == ">header1|1\nDYK\n>header1|1R\nFVI\n"


def test_translate_table_show():
    out = R.translate("", table="1", show_table=True)
    lines = out.splitlines()
    assert lines[0] == "universal=1"
    assert lines[1] == "AAs    = FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
    assert lines[3] == "Base1  = TTTTTTTTTTTTTTTTCCCCCCCCCCCCCCCCAAAAAAAAAAAAAAAAGGGGGGGGGGGGGGGG"


def test_prot2kmer_doc():
    out = R.prot2kmer(">header1\nDAIGDVAKAYKKAG*S\n", k=9)
    assert out == (">header1\nDAIGDVAKA\nAIGDVAKAY\nIGDVAKAYK\nGDVAKAYKK\n"
                   "DVAKAYKKA\nVAKAYKKAG\nAKAYKKAG*\nKAYKKAG*S\n")


def test_prot2tryp_doc():
    inp = ">header1\nAYKKAGVSGHVWQSDGITNCLLRGLTRVKEAVANRDSGNGYINKVYYWTVDKRATTRDALDAGVDGIMTNYPDVITDVLN\n"
    out = R.prot2tryp(inp)
    assert out == (">header1\nAYK\nK\nAGVSGHVWQSDGITNCLLR\nGLTR\nVK\nEAVANR\n"
                   "DSGNGYINK\nVYYWTVDK\nR\nATTR\nDALDAGVDGIMTNYPDVITDVLN\n")


def test_filter_doc():
    inp = (">header1\nAYKKAGVSGHVWQSDGITNCLLRGLTRVKEAVANRDSGNGYINKVYYWTVDKRATTRDALDAGVDGIMTNYPDVITDVLN\n"
           "AYK\nK\nAGVSGHVWQSDGITNCLLR\nGLTR\nVK\nEAVANR\nDSGNGYINK\n")
    out = R.filter_cmd(inp)
    assert out == ">header1\nAGVSGHVWQSDGITNCLLR\nEAVANR\nDSGNGYINK\n"
    out = R.filter_cmd(inp, min_length=0, contains="R", lacks="K")
    assert out == ">header1\nAGVSGHVWQSDGITNCLLR\nGLTR\nEAVANR\n"


def test_uniq_doc():
    inp = ">header1/1\n147206\n240495\n>header1/2\n1883\n1\n1883\n1883\n"
    out = R.uniq(inp, delimiter="/")
    assert out == ">header1\n147206\n240495\n1883\n1\n1883\n1883\n"


def test_seedextend_doc():
    inp = (">header1|1\n9606\n9606\n2759\n9606\n9606\n9606\n9606\n9606\n9606\n9606\n8287\n"
           ">header1|2\n2026807\n888268\n186802\n1598\n1883\n"
           ">header1|3\n1883\n"
           ">header1|1R\n27342\n2759\n155619\n1133106\n38033\n2\n"
           ">header1|2R\n"
           ">header1|3R\n2951\n")
    out = R.seedextend(inp)
    assert out == (">header1|1\n9606\n9606\n2759\n9606\n9606\n9606\n9606\n9606\n"
                   "9606\n9606\n8287\n>header1|2\n>header1|3\n>header1|1R\n"
                   ">header1|2R\n>header1|3R\n")


def test_bestof_doc():
    inp = (">header1|1\n9606\n9606\n2759\n9606\n9606\n9606\n9606\n9606\n9606\n9606\n8287\n"
           ">header1|2\n2026807\n888268\n186802\n1598\n1883\n"
           ">header1|3\n1883\n"
           ">header1|1R\n27342\n2759\n155619\n1133106\n38033\n2\n"
           ">header1|2R\n"
           ">header1|3R\n2951\n")
    out = R.bestof(inp)
    assert out == (">header1|1\n9606\n9606\n2759\n9606\n9606\n9606\n9606\n9606\n"
                   "9606\n9606\n8287\n")


def test_taxa2agg_doc(tree):
    # adapted: the src/commands/taxa2agg.rs doc example needs the full
    # NCBI taxonomy; use the fixture taxonomy instead.
    inp = ">header1\n185751\n185751\n12884\n12884\n1\n12884\n"
    out = R.taxa2agg(inp, FIXTURE_TSV, method="rmq", strategy="mrtl")
    assert out == ">header1\n185751\n"
    out = R.taxa2agg(">h\n0\n0\n", FIXTURE_TSV)
    assert out == ">h\n1\n"


def test_taxa2freq_fixture():
    inp = "12884\n185751\n185751\n185752\n1\njunk\n"
    out = R.taxa2freq(FIXTURE_TSV, [("stdin", inp)], rank="family", min_frequency=0)
    lines = out.splitlines()
    assert lines[0] == "taxon id,taxon name,stdin"
    assert "185751,Pospiviroidae,2" in lines
    assert "185752,Avsunviroidae,1" in lines
    # 12884 and 1 both snap to the root (the root is its own ancestor
    # even though it fails the rank filter, src/taxon.rs:279)
    assert "1,root,2" in lines
    # pinned row order: descending total, ties by ascending taxon id
    assert lines[1] == "1,root,2"
    assert lines[2] == "185751,Pospiviroidae,2"


def test_snaptaxon_fixture():
    inp = ">header1\n185751\n12884\n2\n"
    out = R.snaptaxon(inp, FIXTURE_TSV, rank="family")
    assert out == ">header1\n185751\n1\n1\n"
    out = R.snaptaxon(inp, FIXTURE_TSV, taxons=[12884])
    assert out == ">header1\n12884\n12884\n1\n"


def test_taxonomy_fixture():
    out = R.taxonomy_cmd("185751\n", FIXTURE_TSV)
    assert out == ("taxon_id\ttaxon_name\ttaxon_rank\n"
                   "185751\tPospiviroidae\tfamily\n")
    out = R.taxonomy_cmd("185751\n", FIXTURE_TSV, no_header=True, all_ranks=True)
    cells = out.rstrip("\n").split("\t")
    assert cells[0] == "185751"
    # superkingdom columns filled with Viroids, family with itself
    sk = R.parse_rank("superkingdom")
    fam = R.parse_rank("family")
    assert cells[3 + 2 * (sk - 1)] == "12884"
    assert cells[3 + 2 * (fam - 1)] == "185751"


def test_splitkmers_joinkmers_doc():
    out = R.splitkmers("654924\tNAKYDTDQGVGRMLFLGL\n", k=9)
    assert out.startswith("NAKYDTDQG\t654924\nAKYDTDQGV\t654924\n")
    out_p = R.splitkmers("654924\tNAKYDTDQGVGRMLFLGL\n", k=9, prefix="A")
    assert out_p.startswith("KYDTDQGV\t654924\n")

    # joinkmers with the fixture taxonomy
    inp = "AAAAA\t185751\nAAAAA\t185752\nAAAAA\t185752\nBBBBBB\t12884\n"
    out = R.joinkmers(inp, FIXTURE_TSV)
    lines = out.splitlines()
    assert lines[1] == "BBBBBB\t12884\tsuperkingdom"
    # tree::mix f=0.95: 185752 share is 2/3 < 0.95 -> stays at 12884
    assert lines[0] == "AAAAA\t12884\tsuperkingdom"


def test_buildindex_printindex_roundtrip():
    tsv = "AAAAA\t2759\nBBBBBB\t9153\n"
    assert R.printindex(R.buildindex(tsv)) == tsv


def test_fastq2fasta_interleave():
    fq1 = "@r1/1\nACGT\n+\nIIII\n@r2/1\nGGGG\n+\nIIII\n"
    fq2 = "@r1/2\nTTTT\n+\nIIII\n"
    out = R.fastq2fasta([fq1, fq2])
    # stops when the shorter file runs out
    assert out == ">r1/1\nACGT\n>r1/2\nTTTT\n"


def test_rank_score_quirk():
    # src/rank.rs:86-99 realized semantics
    assert R.rank_score(R.parse_rank("superkingdom")) == 12
    assert R.rank_score(R.parse_rank("genus")) == 12
    assert R.rank_score(R.parse_rank("species subgroup")) == 12
    assert R.rank_score(R.parse_rank("species")) is None
    assert R.rank_score(R.parse_rank("strain")) is None
    assert R.rank_score(R.NO_RANK) is None
