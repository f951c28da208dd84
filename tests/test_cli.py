"""CLI tests against the reference's documented shell transcripts
(verbatim_doc_comment examples in /root/reference/src/commands/*.rs)."""

import io

import numpy as np
import pytest

from umgap_tpu.cli import main
from umgap_tpu.taxonomy import Taxon, fixture_taxa
from umgap_tpu import ranks


def run(argv, stdin=""):
    out = io.StringIO()
    rc = main(argv, stdin=io.StringIO(stdin), stdout=out)
    return rc, out.getvalue()


@pytest.fixture
def taxfile(tmp_path):
    path = tmp_path / "taxons.tsv"
    lines = []
    for t in fixture_taxa():
        valid = "\x01" if t.valid else "\x00"
        lines.append(f"{t.id}\t{t.name}\t{ranks.rank_name(t.rank)}\t{t.parent}\t{valid}")
    path.write_text("\n".join(lines) + "\n")
    return str(path)


# -- translate ---------------------------------------------------------- #

def test_translate_single_frame():
    rc, out = run(["translate", "-f", "1"], ">header1\nGATTACAAA\n")
    assert rc == 0
    assert out == ">header1\nDYK\n"


def test_translate_two_frames_named():
    rc, out = run(["translate", "-f", "1", "-f", "1R", "-n"], ">header1\nGATTACAAA\n")
    assert out == ">header1|1\nDYK\n>header1|1R\nFVI\n"


def test_translate_show_table():
    rc, out = run(["translate", "-t", "11", "-s"], "")
    assert out.startswith("bacterial=11\n")
    assert "AAs    = FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG" in out


def test_translate_all_frames_count():
    rc, out = run(["translate", "-a"], ">h\nGATTACAAA\n")
    assert out.count(">h") == 6


# -- fastq2fasta -------------------------------------------------------- #

def test_fastq2fasta(tmp_path):
    f1 = tmp_path / "a.fq"
    f2 = tmp_path / "b.fq"
    f1.write_text("@r1/1\nAAAA\n+\nIIII\n@r2/1\nCCCC\n+\nIIII\n")
    f2.write_text("@r1/2\nGGGG\n+\nIIII\n@r2/2\nTTTT\n+\nIIII\n")
    rc, out = run(["fastq2fasta", str(f1), str(f2)])
    assert out == ">r1/1\nAAAA\n>r1/2\nGGGG\n>r2/1\nCCCC\n>r2/2\nTTTT\n"


# -- prot2kmer / prot2tryp / filter ------------------------------------- #

def test_prot2kmer():
    rc, out = run(["prot2kmer"], ">header1\nDAIGDVAKAYKKAG*S\n")
    lines = out.splitlines()
    assert lines[0] == ">header1"
    assert lines[1] == "DAIGDVAKA"
    assert lines[-1] == "KAYKKAG*S"
    assert len(lines) == 9


def test_prot2kmer_short_skipped():
    rc, out = run(["prot2kmer"], ">h\nSHORT\n")
    assert out == ""


def test_prot2tryp():
    seq = ("AYKKAGVSGHVWQSDGITNCLLRGLTRVKEAVANRDSGNGYINKVYYWTVDKRATTRDALDAG"
           "VDGIMTNYPDVITDVLN")
    rc, out = run(["prot2tryp"], f">header1\n{seq}\n")
    assert out.splitlines() == [
        ">header1", "AYK", "K", "AGVSGHVWQSDGITNCLLR", "GLTR", "VK", "EAVANR",
        "DSGNGYINK", "VYYWTVDK", "R", "ATTR", "DALDAGVDGIMTNYPDVITDVLN"]


def test_filter():
    stdin = (">header1\n"
             "AYKKAGVSGHVWQSDGITNCLLRGLTRVKEAVANRDSGNGYINKVYYWTVDKRATTRDALDAGVDGIMTNYPDVITDVLN\n"
             "AYK\nK\nAGVSGHVWQSDGITNCLLR\nGLTR\nVK\nEAVANR\nDSGNGYINK\n")
    rc, out = run(["filter"], stdin)
    assert out.splitlines() == [">header1", "AGVSGHVWQSDGITNCLLR", "EAVANR", "DSGNGYINK"]
    rc, out = run(["filter", "-m", "0", "-c", "R", "-l", "K"], stdin)
    assert out.splitlines() == [">header1", "AGVSGHVWQSDGITNCLLR", "GLTR", "EAVANR"]


# -- uniq / bestof ------------------------------------------------------ #

def test_uniq():
    stdin = ">header1/1\n147206\n240495\n>header1/2\n1883\n1\n1883\n1883\n"
    rc, out = run(["uniq", "-d", "/"], stdin)
    assert out == ">header1\n147206\n240495\n1883\n1\n1883\n1883\n"


def test_bestof():
    stdin = (">h|1\n9606\n9606\n2759\n9606\n8287\n"
             ">h|2\n2026807\n888268\n186802\n1598\n1883\n"
             ">h|3\n1883\n"
             ">h|1R\n27342\n2759\n155619\n1133106\n38033\n2\n"
             ">h|2R\n"
             ">h|3R\n2951\n")
    rc, out = run(["bestof"], stdin)
    # 6th record (3R) triggers processing of the first 5 and is dropped;
    # frame 1R has 6 non-root hits vs frame 1's 5
    assert out.splitlines()[0] == ">h|1R"


# -- seedextend --------------------------------------------------------- #

def test_seedextend_cli():
    stdin = (">header1|1\n9606\n9606\n2759\n9606\n9606\n9606\n9606\n9606\n"
             "9606\n9606\n8287\n>header1|2\n2026807\n888268\n186802\n1598\n1883\n")
    rc, out = run(["seedextend"], stdin)
    parts = out.split(">")
    assert "9606" in parts[1]
    assert parts[2] == "header1|2\n"


# -- index + lookups ---------------------------------------------------- #

def test_buildindex_printindex_roundtrip(tmp_path):
    import io as iomod
    from umgap_tpu.cli import cmd_buildindex

    tsv = "AAAAA\t2759\nBBBBBB\t9153\n"
    idx = tmp_path / "tiny.index"

    class A:
        kind = "auto"

    out = iomod.BytesIO()
    cmd_buildindex(A, iomod.StringIO(tsv), out)
    idx.write_bytes(out.getvalue())
    rc, printed = run(["printindex", str(idx)])
    assert printed == "AAAAA\t2759\nBBBBBB\t9153\n"


def _write_index(tmp_path, tsv, kind="auto"):
    import io as iomod
    from umgap_tpu.cli import cmd_buildindex

    class A:
        pass

    A.kind = kind
    out = iomod.BytesIO()
    cmd_buildindex(A, iomod.StringIO(tsv), out)
    idx = tmp_path / "test.index"
    idx.write_bytes(out.getvalue())
    return str(idx)


def test_pept2lca(tmp_path):
    idx = _write_index(tmp_path, "AAALTER\t2\nENFVYLAK\t3398\n", kind="peptide")
    rc, out = run(["pept2lca", idx], ">header1\nAAALTER\nENFVYLAK\n")
    assert out == ">header1\n2\n3398\n"
    rc, out = run(["pept2lca", idx], ">header1\nMISSING\nENFVYLAK\n")
    assert out == ">header1\n3398\n"
    rc, out = run(["pept2lca", "-o", idx], ">header1\nMISSING\nENFVYLAK\n")
    assert out == ">header1\n0\n3398\n"


def test_prot2kmer2lca(tmp_path):
    # index the 9-mers of DAIGDVAKAYKKAG with values 1..6
    from umgap_tpu.ops import encoding, kmers

    prot = "DAIGDVAKAYKKAG"
    packed = kmers.pack_kmers_host(encoding.encode_aa(prot), 9)
    tsv = "".join(
        f"{kmers.unpack_kmer(int(p), 9)}\t{i + 1}\n" for i, p in enumerate(packed)
    )
    idx = _write_index(tmp_path, tsv, kind="kmer")
    rc, out = run(["prot2kmer2lca", idx], f">h\n{prot}\n")
    assert out == ">h\n" + "".join(f"{i + 1}\n" for i in range(6))
    # short read: no header at all
    rc, out = run(["prot2kmer2lca", idx], ">h\nSHORT\n")
    assert out == ""
    # -o: misses become 0
    rc, out = run(["prot2kmer2lca", "-o", idx], ">h\nDAIGDVAKAXX\n")
    assert out == ">h\n1\n0\n0\n"


def test_prot2tryp2lca(tmp_path):
    idx = _write_index(tmp_path, "AGVSGHVWQSDGITNCLLR\t571525\nEAVANR\t6920\n",
                       kind="peptide")
    stdin = (">header1\n"
             "AYKKAGVSGHVWQSDGITNCLLRGLTRVKEAVANRDSGNGYINKVYYWTVDKR\n")
    rc, out = run(["prot2tryp2lca", idx], stdin)
    assert out == ">header1\n571525\n6920\n"


# -- taxa2agg ----------------------------------------------------------- #

def test_taxa2agg_default(taxfile):
    stdin = ">header1\n185751\n185751\n12884\n12884\n1\n12884\n"
    rc, out = run(["taxa2agg", taxfile], stdin)
    assert rc == 0
    assert out == ">header1\n185751\n"


def test_taxa2agg_empty_becomes_root(taxfile):
    rc, out = run(["taxa2agg", taxfile], ">h\n0\n0\n")
    assert out == ">h\n1\n"


def test_taxa2agg_mrtl(taxfile):
    rc, out = run(["taxa2agg", "-m", "rmq", "-a", "mrtl", "-l", "1", taxfile],
                  ">h\n185751\n12884\n185751\n")
    assert out == ">h\n185751\n"


def test_taxa2agg_lca_star(taxfile):
    rc, out = run(["taxa2agg", "-a", "lca*", taxfile], ">h\n185751\n185752\n")
    assert out == ">h\n12884\n"


def test_taxa2agg_scored(taxfile):
    rc, out = run(["taxa2agg", "-s", taxfile], ">h\n185751=0.9\n185752=0.1\n")
    assert out == ">h\n185751\n"


# -- taxa2freq ---------------------------------------------------------- #

def test_taxa2freq(taxfile):
    # 6-taxon fixture has no species, so snap to family
    stdin = "185751\n185751\n185751\n12884\n1\n"
    rc, out = run(["taxa2freq", "-r", "family", taxfile], stdin)
    lines = out.splitlines()
    assert lines[0] == "taxon id,taxon name,stdin"
    # 185751 x3; 12884 and 1 -> root (above family) = 2, both rows pass > 1
    assert lines[1] == "185751,Pospiviroidae,3"
    assert lines[2] == "1,root,2"


def test_taxa2freq_threshold(taxfile):
    stdin = "185751\n185751\n12884\n"
    rc, out = run(["taxa2freq", "-r", "family", "-f", "2", taxfile], stdin)
    lines = out.splitlines()
    # 185751 has 2 -> not > 2; root has 1 -> dropped
    assert lines == ["taxon id,taxon name,stdin"]


# -- snaptaxon / taxonomy ----------------------------------------------- #

def test_snaptaxon_rank(taxfile):
    rc, out = run(["snaptaxon", "-r", "superkingdom", taxfile],
                  ">header1\n185751\n12884\n1\n")
    assert out == ">header1\n12884\n12884\n1\n"


def test_snaptaxon_taxa(taxfile):
    rc, out = run(["snaptaxon", "-t", "12884", taxfile], "185752\n2\n")
    assert out == "12884\n1\n"


def test_taxonomy(taxfile):
    rc, out = run(["taxonomy", taxfile], "185751\n2\n")
    lines = out.splitlines()
    assert lines[0] == "taxon_id\ttaxon_name\ttaxon_rank"
    assert lines[1] == "185751\tPospiviroidae\tfamily"
    assert lines[2] == "2\tBacteria\tsuperkingdom"


def test_taxonomy_all_ranks(taxfile):
    rc, out = run(["taxonomy", "-a", taxfile], "185751\n")
    lines = out.splitlines()
    assert "superkingdom_id\tsuperkingdom_name" in lines[0]
    assert "\t12884\tViroids" in lines[1]
    assert "\t185751\tPospiviroidae" in lines[1]


def test_taxonomy_unknown_errors(taxfile):
    rc, out = run(["taxonomy", taxfile], "999999\n")
    assert rc == 1


# -- splitkmers / joinkmers --------------------------------------------- #

def test_splitkmers():
    rc, out = run(["splitkmers", "-k", "5"], "654924\tMNAKYDTDQ\n")
    lines = out.splitlines()
    assert lines[0] == "MNAKY\t654924"
    assert lines[-1] == "YDTDQ\t654924"
    assert len(lines) == 5


def test_splitkmers_prefix():
    rc, out = run(["splitkmers", "-k", "5", "-p", "M"], "654924\tMNAKYDTDQM\n")
    assert out.splitlines() == ["NAKY\t654924"]


def test_joinkmers(taxfile):
    stdin = "AAAAA\t185751\nAAAAA\t185752\nAAAAA\t12884\nBBBBB\t185751\n"
    rc, out = run(["joinkmers", taxfile], stdin)
    lines = out.splitlines()
    # group AAAAA: hybrid f=0.95 -> 12884 (superkingdom)
    assert lines[0] == "AAAAA\t12884\tsuperkingdom"
    assert lines[1] == "BBBBB\t185751\tfamily"


def test_end_to_end_index_build(taxfile, tmp_path):
    """splitkmers | sort | joinkmers | buildindex | pept2lca chain."""
    rc, split_out = run(["splitkmers", "-k", "5"],
                        "185751\tAAAAABBBB\n185752\tAAAAACCCC\n")
    rows = sorted(split_out.splitlines())
    rc, join_out = run(["joinkmers", taxfile], "\n".join(rows) + "\n")
    # build index from (kmer, taxon) columns
    tsv = "".join(f"{l.split(chr(9))[0]}\t{l.split(chr(9))[1]}\n"
                  for l in join_out.splitlines())
    idx = _write_index(tmp_path, tsv, kind="kmer")
    rc, out = run(["pept2lca", idx], ">h\nAAAAA\nAAAAB\nZZZZZ\n")
    # AAAAA seen in both 185751 and 185752 -> LCA-ish 12884
    assert out == ">h\n12884\n185751\n"


def test_buildindex_rejects_duplicate_keys():
    """Duplicate keys would corrupt the device probe's multi-slot
    select; the reference's FST builder rejects them too."""
    import io as iomod

    out = iomod.StringIO()
    rc = main(["buildindex"],
                  stdin=iomod.StringIO("AAAAAAAAA\t2\nAAAAAAAAA\t3\n"),
                  stdout=out)
    assert rc == 1
