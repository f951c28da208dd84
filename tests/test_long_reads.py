"""Exact handling of records beyond the device width cap (no clipping).

The reference streams records of ANY length through every command
(/root/reference/src/io/fasta.rs:62-64).  `analyse` runs records beyond
its top device width bucket through an exact host path and everything
else on device, byte-identical to the composed CLI pipeline (whose
stream commands are themselves oracle-golden-tested at any length).
"""

import io
import os

import numpy as np
import pytest

from umgap_tpu.cli import main

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "golden", "data")
TAXONOMY = os.path.join(DATA, "taxonomy.tsv")

LONG_LEN = 6000  # > the 4096 bp top width bucket


def run(argv, stdin=""):
    out = io.StringIO()
    rc = main(argv, stdin=io.StringIO(stdin), stdout=out)
    assert rc == 0, f"exit {rc} for {argv}"
    return out.getvalue()


def _planted_taxon():
    with open(os.path.join(DATA, "ninemer.tsv")) as f:
        return int(f.readline().split("\t")[1])


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """A 9-mer index planting frame-1 9-mers of a long read and a short
    read, plus the FASTA holding them (long record in the middle)."""
    from umgap_tpu.index.table import KmerTable
    from umgap_tpu.ops import encoding, kmers, translate

    tmp = tmp_path_factory.mktemp("longreads")
    rng = np.random.default_rng(11)
    reads = {
        "r0": "".join("ACGT"[c] for c in rng.integers(0, 4, 120)),
        "r1": "".join("ACGT"[c] for c in rng.integers(0, 4, LONG_LEN)),
        "r2": "".join("ACGT"[c] for c in rng.integers(0, 4, 90)),
    }
    taxon = _planted_taxon()
    packed = []
    for name in ("r0", "r1"):
        pep = translate.translate_sequence(
            reads[name], ["1"], encoding.get_table(1))[0]
        packed.append(kmers.pack_kmers_host(encoding.encode_aa(pep), 9))
    packed = np.unique(np.concatenate(packed))
    table = KmerTable.build(packed,
                            np.full(len(packed), taxon, np.int32), k=9)
    idx = tmp / "nine.npz"
    table.save(idx)
    fa = tmp / "reads.fa"
    with open(fa, "w") as f:
        for name, seq in reads.items():
            f.write(f">{name}\n{seq}\n")
    return str(fa), str(idx), taxon


def _composed(fa_text, idx, s, l, method, strategy):
    x = run(["translate", "-a"], fa_text)
    x = run(["prot2kmer2lca", "-o", idx], x)
    x = run(["seedextend", "-g", "1", "-s", str(s)], x)
    x = run(["uniq", "-d", "/"], x)
    return run(["taxa2agg", "-l", str(l), "-m", method, "-a", strategy,
                TAXONOMY], x)


@pytest.mark.parametrize("preset, s, l, method, strategy", [
    ("max-sensitivity", 2, 1, "rmq", "mrtl"),
    ("high-precision", 3, 2, "tree", "lca*"),
])
def test_long_record_exact(world, preset, s, l, method, strategy):
    fa, idx, taxon = world
    with open(fa) as f:
        fa_text = f.read()
    expected = _composed(fa_text, idx, s, l, method, strategy)
    got = run(["analyse", "-t", preset, "-1", fa,
               "--taxons", TAXONOMY, "--index", idx,
               "--batch-size", "64", "--read-length", "128"])
    assert got == expected
    # the long read must actually resolve (the comparison is not
    # trivially all-misses)
    by_read = {b.splitlines()[0]: b.splitlines()[1]
               for b in got.split(">")[1:]}
    assert by_read["r1"] == str(taxon)
    assert by_read["r0"] == str(taxon)


def test_long_record_mid_stream_paired(world, tmp_path):
    """A long record in the middle of a paired FASTQ sample: batches
    already emitted through the native stream stay intact (prefix skip)
    and the rest reroutes — output equals the composed pipeline."""
    _fa, idx, taxon = world
    rng = np.random.default_rng(12)
    n = 150
    long_at = 130  # after the first 64-batch has been emitted
    seqs1, seqs2 = [], []
    for i in range(n):
        ln = LONG_LEN if i == long_at else 100
        seqs1.append("".join("ACGT"[c] for c in rng.integers(0, 4, ln)))
        seqs2.append("".join("ACGT"[c] for c in rng.integers(0, 4, 100)))
    fq1, fq2 = tmp_path / "a1.fq", tmp_path / "a2.fq"
    for path, seqs, end in ((fq1, seqs1, 1), (fq2, seqs2, 2)):
        with open(path, "w") as f:
            for i, s_ in enumerate(seqs):
                f.write(f"@p{i}/{end}\n{s_}\n+\n{'I' * len(s_)}\n")

    x = run(["fastq2fasta", str(fq1), str(fq2)])
    x = run(["translate", "-a"], x)
    x = run(["prot2kmer2lca", "-o", idx], x)
    x = run(["seedextend", "-g", "1", "-s", "2"], x)
    x = run(["uniq", "-d", "/"], x)
    expected = run(["taxa2agg", "-l", "1", "-m", "rmq", "-a", "mrtl",
                    TAXONOMY], x)

    got = run(["analyse", "-t", "max-sensitivity",
               "-1", str(fq1), "-2", str(fq2),
               "--taxons", TAXONOMY, "--index", idx,
               "--batch-size", "64", "--read-length", "128"])
    assert got == expected
    assert got.count(">") == n
