"""Fast native+device index build vs the host joinkmers oracle."""

import numpy as np
import pytest

from umgap_tpu import ranks
from umgap_tpu.index.build import build_kmer_index_fast, join_kmers, split_kmers
from umgap_tpu.io import native
from umgap_tpu.ops import encoding, kmers
from umgap_tpu.taxonomy import Taxon, Taxonomy

pytestmark = pytest.mark.skipif(
    not native.ensure_built(), reason="native library unavailable")


def world():
    rng = np.random.default_rng(21)
    S = ranks.rank_index("superkingdom")
    G = ranks.rank_index("genus")
    SP = ranks.rank_index("species")
    taxa = [Taxon(1, "root", ranks.NO_RANK, 1, True),
            Taxon(2, "B", S, 1, True)]
    tid = 3
    for g in range(6):
        genus = tid
        taxa.append(Taxon(genus, f"g{g}", G, 2, True))
        tid += 1
        for s in range(4):
            taxa.append(Taxon(tid, f"s{g}.{s}", SP, genus, rng.random() < 0.9))
            tid += 1
    tax = Taxonomy(taxa)
    species = [t.id for t in taxa if t.rank == SP]
    aas = "ACDEFGHIKLMNPQRSTVWY"
    prots = []
    base = "".join(rng.choice(list(aas), size=40))
    for sid in species:
        # shared segments across species force multi-taxon k-mer groups
        own = "".join(rng.choice(list(aas), size=30))
        prots.append((sid, base[:20] + own + base[20:]))
    return tax, prots


def test_fast_build_matches_joinkmers():
    tax, prots = world()
    tsv = "".join(f"{tid}\t{seq}\n" for tid, seq in prots)

    # host oracle: splitkmers | sort | joinkmers
    rows = sorted(split_kmers(prots, k=9))
    expect = {kmer: taxon for kmer, taxon, _r in join_kmers(rows, tax)}

    table = build_kmer_index_fast(tsv.encode(), tax, k=9)
    assert table.n == len(expect)
    for kmer, taxon in expect.items():
        packed = np.array([kmers.pack_peptide_host(encoding.encode_aa(kmer))],
                          dtype=np.uint64)
        hi, lo = kmers.split_packed(packed)
        vals, found = table.probe_host(hi, lo)
        assert found[0], kmer
        assert int(vals[0]) == taxon, kmer
