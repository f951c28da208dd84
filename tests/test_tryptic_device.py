"""Device tryptic digest vs the host parity oracle."""

import numpy as np
import jax.numpy as jnp

from umgap_tpu import ranks
from umgap_tpu.agg import device as devagg
from umgap_tpu.index.table import PeptideTable, fingerprint_host
from umgap_tpu.ops import encoding, kmers as kmerops, lookup
from umgap_tpu.pipeline import tryptic as tr
from umgap_tpu.taxonomy import Taxon, Taxonomy


def _host_frame_fingerprints(pep: str, min_len=9, max_len=45):
    out = []
    for frag in kmerops.tryptic_digest(pep):
        if min_len <= len(frag) <= max_len:
            h1, h2 = fingerprint_host(encoding.encode_aa(frag))
            out.append((np.int32(h1), np.int32(h2)))
    return out


def test_device_digest_matches_host_oracle():
    rng = np.random.default_rng(3)
    # adversarial alphabet: heavy K/R/P/* density plus ordinary letters
    alphabet = np.array([encoding.AA_FROM_BYTE[ord(c)] for c in
                         "KKRRPP**ACDEFGHILMNQSTVWY-"], dtype=np.uint8)
    R, P = 300, 54
    codes = alphabet[rng.integers(0, len(alphabet), (R, P))]
    plens = rng.integers(0, P + 1, R).astype(np.int32)
    c1, c2, valid = tr.tryptic_digest_device(
        jnp.asarray(codes), jnp.asarray(plens))
    c1, c2, valid = np.asarray(c1), np.asarray(c2), np.asarray(valid)
    for r in range(R):
        pep = encoding.decode_aa(codes[r, : plens[r]])
        expect = _host_frame_fingerprints(pep)
        got = [(c1[r, f], c2[r, f]) for f in range(valid.shape[1])
               if valid[r, f]]
        assert got == expect, (r, pep, got, expect)


def test_tryptic_pipeline_step_matches_host_path():
    rng = np.random.default_rng(4)
    S = ranks.rank_index("species")
    taxa = [Taxon(1, "root", ranks.NO_RANK, 1, True)] + [
        Taxon(i, f"s{i}", S, 1, True) for i in range(2, 40)]
    tax = Taxonomy(taxa)

    # reads + a peptide table indexing some real tryptic fragments
    reads = ["".join("ACGT"[c] for c in rng.integers(0, 4, 100))
             for _ in range(24)]
    tt = encoding.get_table(1)
    peptides, values = [], []
    for i, seq in enumerate(reads):
        codes = encoding.encode_dna(seq)
        for fc in (codes, codes[1:], codes[2:]):
            pep = encoding.decode_aa(tt.translate_frame(fc))
            for frag in kmerops.tryptic_digest(pep):
                if 9 <= len(frag) <= 45:
                    peptides.append(frag)
                    values.append(2 + (i % 38))
    # unique keys (first value wins, like buildindex on sorted input)
    seen = {}
    for p, v in zip(peptides, values):
        seen.setdefault(p, v)
    table = PeptideTable.build(list(seen), np.array(
        [seen[p] for p in seen], np.int32))
    dtax = devagg.DeviceTaxonomy.from_host(tax)
    dtable = lookup.DeviceTable.from_host(table)
    config = tr.TRYPTIC_PRESETS["tryptic-sensitivity"]

    groups = [(f"r{i}", [seq, ""]) for i, seq in enumerate(reads)]
    host = tr.analyse_tryptic_groups(groups, tax, table, config,
                                     batch_size=8, max_peptides=256)

    # device path over the same groups
    B, E, L = len(groups), 2, 100
    dna = np.full((B, E, L), encoding.DNA_N, np.uint8)
    lens = np.zeros((B, E), np.int32)
    for b, (_h, seqs) in enumerate(groups):
        for e, s in enumerate(seqs):
            c = encoding.encode_dna(s)
            dna[b, e, : len(c)] = c
            lens[b, e] = len(c)
    got = tr.tryptic_pipeline_step(
        jnp.asarray(dna), jnp.asarray(lens), dtax, dtable, config)
    got = [int(x) for x in np.asarray(got)]
    assert got == [t for _h, t in host]
