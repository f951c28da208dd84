"""FASTA/FASTQ IO parity tests (reference src/io/fasta.rs, fastq.rs)."""

import io

import pytest

from umgap_tpu.io import fasta, fastq


def test_fasta_read_multiline():
    s = io.StringIO(">h1\nAAA\nBBB\n>h2\nCCC\n")
    recs = list(fasta.read_records(s))
    assert recs[0].header == "h1"
    assert recs[0].sequence == ["AAA", "BBB"]
    assert recs[1].sequence == ["CCC"]


def test_fasta_read_unwrap():
    s = io.StringIO(">h1\nAAA\nBBB\n")
    recs = list(fasta.read_records(s, unwrap=True))
    assert recs[0].sequence == ["AAABBB"]


def test_fasta_no_header_errors():
    with pytest.raises(fasta.FastaError):
        list(fasta.read_records(io.StringIO("AAA\n")))


def test_fasta_writer_separator_and_newlines():
    out = io.StringIO()
    w = fasta.Writer(out, separator="\n", wrap=False)
    w.write_record(fasta.Record("h", ["123", "456"]))
    assert out.getvalue() == ">h\n123\n456\n"


def test_fasta_writer_empty_sequence_quirks():
    # reference: unwrapped empty sequence -> ">h\n" (newline, no trailing)
    out = io.StringIO()
    fasta.Writer(out, "", False).write_record(fasta.Record("h", []))
    assert out.getvalue() == ">h\n"
    # wrapped empty sequence -> ">h" without any newline
    out = io.StringIO()
    fasta.Writer(out, "", True).write_record(fasta.Record("h", []))
    assert out.getvalue() == ">h"


def test_fasta_writer_wrap_70():
    out = io.StringIO()
    seq = "A" * 150
    fasta.Writer(out, "", True).write_record(fasta.Record("h", [seq]))
    lines = out.getvalue().split("\n")
    assert lines[0] == ">h"
    assert lines[1] == "A" * 70
    assert lines[2] == "A" * 70
    assert lines[3] == "A" * 10
    assert lines[4] == ""


def test_fasta_chunked():
    s = io.StringIO("".join(f">h{i}\nAA\n" for i in range(5)))
    chunks = list(fasta.read_chunks(s, 2))
    assert [len(c) for c in chunks] == [2, 2, 1]


def test_fastq_read():
    s = io.StringIO("@r1\nACGT\n+\nIIII\n@r2\nGGGG\n+\nJJJJ\n")
    recs = list(fastq.read_records(s))
    assert recs[0].header == "r1"
    assert recs[0].sequence == "ACGT"
    assert recs[0].quality == "IIII"
    assert recs[1].header == "r2"


def test_fastq_multiline():
    s = io.StringIO("@r1\nAC\nGT\n+\nII\nII\n")
    recs = list(fastq.read_records(s))
    assert recs[0].sequence == "ACGT"
    assert recs[0].quality == "IIII"


def test_fastq_bad_header():
    with pytest.raises(fastq.FastqError):
        list(fastq.read_records(io.StringIO("r1\nACGT\n+\nIIII\n")))


def test_fastq_missing_quality():
    with pytest.raises(fastq.FastqError):
        list(fastq.read_records(io.StringIO("@r1\nACGT\n+\n")))


def test_interleave():
    a = [1, 2, 3]
    b = [4, 5]
    assert list(fastq.interleave([a, b])) == [[1, 4], [2, 5]]
