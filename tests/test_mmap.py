"""Memory-mapped index loads (`-m` flag parity).

The reference mmaps its FST by default and loads into RAM with `-m`
(/root/reference/src/commands/pept2lca.rs:74-79); our uncompressed .npz
artifacts map the same way via the zip-offset mapper."""

import io
import os

import numpy as np

from umgap_tpu.cli import main
from umgap_tpu.index.table import KmerTable, load_table, mmap_npz


def _table(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    packed = np.unique(rng.integers(0, 2 ** 45, size=n, dtype=np.uint64))
    values = rng.integers(1, 1000, size=len(packed)).astype(np.int32)
    return KmerTable.build(packed, values, k=9), packed, values


def test_mmap_npz_matches_full_load(tmp_path):
    t, packed, values = _table()
    p = str(tmp_path / "t.npz")
    t.save(p, compress=False)
    full = np.load(p)
    mapped = mmap_npz(p)
    assert set(mapped) == set(full.files)
    for k in full.files:
        assert np.array_equal(np.asarray(mapped[k]), full[k]), k
    assert isinstance(mapped["rem"], np.memmap)


def test_load_table_mmap_probes_identically(tmp_path):
    t, packed, values = _table()
    p = str(tmp_path / "t.npz")
    t.save(p, compress=False)
    tm = load_table(p, mmap=True)
    from umgap_tpu.ops import kmers

    hi, lo = kmers.split_packed(packed)
    v1, f1 = t.probe_host(hi, lo)
    v2, f2 = tm.probe_host(hi, lo)
    assert np.array_equal(v1, v2) and np.array_equal(f1, f2)
    # misses too
    miss = np.array([123456789], np.uint64)
    mh, ml = kmers.split_packed(miss)
    _, fm = tm.probe_host(mh, ml)


def test_load_table_mmap_compressed_fallback(tmp_path):
    t, packed, values = _table(500)
    p = str(tmp_path / "c.npz")
    t.save(p, compress=True)  # deflated members cannot map
    tm = load_table(p, mmap=True)  # silent full-load fallback
    assert not isinstance(tm.rem, np.memmap)
    assert tm.n == t.n


def test_cli_in_memory_flag_identical(tmp_path):
    # keys must round-trip as real peptides for the CLI encode path
    from umgap_tpu.ops import encoding, kmers

    rng = np.random.default_rng(4)
    aas = np.array(list("ACDEFGHIKLMNPQRSTVWY"))
    peps = ["".join(rng.choice(aas, 9)) for _ in range(500)]
    packed = np.unique(np.concatenate([
        kmers.pack_kmers_host(encoding.encode_aa(p_), 9) for p_ in peps]))
    values = rng.integers(1, 1000, size=len(packed)).astype(np.int32)
    t = KmerTable.build(packed, values, k=9)
    p = str(tmp_path / "t.npz")
    t.save(p, compress=False)

    pep = kmers.unpack_kmer(int(packed[0]), 9)
    stdin = f">q\n{pep}\n"

    def run(extra):
        out = io.StringIO()
        rc = main(["pept2lca", *extra, p],
                  stdin=io.StringIO(stdin), stdout=out)
        assert rc == 0
        return out.getvalue()

    mmap_out = run([])
    ram_out = run(["-m"])
    assert mmap_out == ram_out
    assert mmap_out == f">q\n{int(values[0])}\n"
