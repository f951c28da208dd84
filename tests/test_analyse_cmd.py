"""End-to-end `analyse` command test on the reference testdata sample."""

import io
import os

import numpy as np
import pytest

from umgap_tpu import ranks
from umgap_tpu.cli import main as cli_main
from umgap_tpu.index.table import KmerTable
from umgap_tpu.ops import encoding, kmers as kmerops
from umgap_tpu.taxonomy import Taxon, Taxonomy

TESTDATA = "/root/reference/testdata"


@pytest.fixture
def world(tmp_path):
    S = ranks.rank_index("superkingdom")
    taxa = [
        Taxon(1, "root", ranks.NO_RANK, 1, True),
        Taxon(2, "Bacteria", S, 1, True),
    ]
    tax = Taxonomy(taxa)
    taxfile = tmp_path / "taxons.tsv"
    taxfile.write_text("1\troot\tno rank\t1\t\x01\n2\tBacteria\tsuperkingdom\t1\t\x01\n")

    # index the 9-mers of frame-1 translations of the first testdata read
    with open(os.path.join(TESTDATA, "A1.fq")) as f:
        lines = f.read().splitlines()
    seq = lines[1]
    from umgap_tpu.ops import translate as transmod

    pep = transmod.translate_sequence(seq, ["1"], encoding.get_table(1))[0]
    packed = kmerops.pack_kmers_host(encoding.encode_aa(pep), 9)
    packed = np.unique(packed)
    table = KmerTable.build(packed, np.full(len(packed), 2, np.int32), k=9)
    idxfile = tmp_path / "nine.npz"
    table.save(idxfile)
    return str(taxfile), str(idxfile)


def test_analyse_command_runs(world, tmp_path):
    taxfile, idxfile = world
    out = io.StringIO()
    rc = cli_main(
        ["analyse", "-t", "max-sensitivity",
         "-1", os.path.join(TESTDATA, "A1.fq"),
         "-2", os.path.join(TESTDATA, "A2.fq"),
         "--taxons", taxfile, "--index", idxfile,
         "--batch-size", "32", "--read-length", "100"],
        stdin=io.StringIO(""), stdout=out)
    assert rc == 0
    text = out.getvalue()
    records = text.count(">")
    assert records == 100  # 100 read pairs in the sample
    # the first read's frame-1 9-mers are all indexed -> resolves to taxon 2
    first = text.split(">")[1].splitlines()
    assert first[1] == "2"


def test_analyse_tryptic_runs(world, tmp_path):
    taxfile, idxfile = world
    from umgap_tpu.index.table import PeptideTable

    tryp = PeptideTable.build(["AAAAAAAAA"], np.array([2], np.int32))
    tfile = tmp_path / "tryp.npz"
    tryp.save(tfile)
    out = io.StringIO()
    rc = cli_main(
        ["analyse", "-t", "tryptic-sensitivity",
         "-1", os.path.join(TESTDATA, "A1.fq"),
         "-2", os.path.join(TESTDATA, "A2.fq"),
         "--taxons", taxfile, "--index", str(tfile),
         "--batch-size", "32"],
        stdin=io.StringIO(""), stdout=out)
    assert rc == 0
    assert out.getvalue().count(">") == 100
