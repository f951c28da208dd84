"""Fused-pipeline equivalence vs the CLI command composition.

The reference's analyse pipelines are compositions of stream commands
(scripts/umgap-analyse.sh:276-311). Our CLI reproduces each command
exactly (test_cli.py); here we check that the fused single-program
device pipeline produces identical per-read consensus taxa to running
those commands in sequence.
"""

import io

import numpy as np
import pytest

from umgap_tpu import ranks
from umgap_tpu.cli import main as cli_main
from umgap_tpu.index.build import build_table, join_kmers, split_kmers
from umgap_tpu.ops import encoding
from umgap_tpu.pipeline import PRESETS, PipelineConfig
from umgap_tpu.pipeline.runner import analyse_stream
from umgap_tpu.taxonomy import Taxon, Taxonomy


def run_cli(argv, stdin):
    out = io.StringIO()
    rc = cli_main(argv, stdin=io.StringIO(stdin), stdout=out)
    assert rc == 0
    return out.getvalue()


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """A small taxonomy, proteins per taxon, a 9-mer index, and reads."""
    rng = np.random.default_rng(5)
    S = ranks.rank_index("superkingdom")
    P = ranks.rank_index("phylum")
    G = ranks.rank_index("genus")
    SP = ranks.rank_index("species")
    taxa = [
        Taxon(1, "root", ranks.NO_RANK, 1, True),
        Taxon(2, "Bacteria", S, 1, True),
        Taxon(22, "Proteo", P, 2, True),
        Taxon(23, "Firmi", P, 2, True),
        Taxon(101, "GenusA", G, 22, True),
        Taxon(102, "GenusB", G, 23, True),
        Taxon(1001, "SpecA1", SP, 101, True),
        Taxon(1002, "SpecA2", SP, 101, True),
        Taxon(1003, "SpecB1", SP, 102, True),
    ]
    tax = Taxonomy(taxa)

    aas = "ACDEFGHIKLMNPQRSTVWY"
    proteins = {
        tid: "".join(rng.choice(list(aas), size=60))
        for tid in (1001, 1002, 1003)
    }
    # shared prefix between the two GenusA species -> LCA-aggregated kmers
    proteins[1002] = proteins[1001][:20] + proteins[1002][20:]

    rows = sorted(split_kmers(list(proteins.items()), k=9))
    joined = [(kmer, taxon) for kmer, taxon, _rank in join_kmers(rows, tax)]
    table = build_table(joined, kind="kmer")

    # reverse-translate proteins into DNA reads (universal table, frame 1)
    codon_of = {}
    t1 = encoding.get_table(1)
    for idx in range(125):
        a, b, c = idx // 25, (idx // 5) % 5, idx % 5
        if 4 not in (a, b, c) and t1.aa[idx] not in codon_of:
            codon_of[int(t1.aa[idx])] = (a, b, c)

    def to_dna(pep):
        codes = []
        for ch in pep:
            codes.extend(codon_of[int(encoding.AA_FROM_BYTE[ord(ch)])])
        return encoding.decode_dna(np.array(codes, np.uint8))

    reads = []
    for i in range(24):
        tid = [1001, 1002, 1003][i % 3]
        prot = proteins[tid]
        start = int(rng.integers(0, 20))
        pep1 = prot[start : start + 20]
        pep2 = prot[start + 15 : start + 35]
        r1 = to_dna(pep1)
        r2 = to_dna(pep2)
        if i % 5 == 0:  # some noise reads
            r1 = "".join(rng.choice(list("ACGT"), size=len(r1)))
        reads.append((f"read{i}", r1, r2))
    return tax, table, reads


def cli_reference_run(world, tmp_path, seed_s, seed_g, lb, method, strategy, factor):
    tax, table, reads = world
    taxfile = tmp_path / "taxons.tsv"
    lines = []
    for tid in np.nonzero(tax.present)[0]:
        t = tax.get(int(tid))
        lines.append(
            f"{t.id}\t{t.name}\t{ranks.rank_name(t.rank)}\t{t.parent}\t\x01")
    taxfile.write_text("\n".join(lines) + "\n")
    idxfile = tmp_path / "idx.npz"
    table.save(idxfile)

    fasta_in = "".join(
        f">{h}/1\n{r1}\n>{h}/2\n{r2}\n" for h, r1, r2 in reads
    )
    s = run_cli(["translate", "-a"], fasta_in)
    s = run_cli(["prot2kmer2lca", "-o", str(idxfile)], s)
    s = run_cli(["seedextend", f"-g{seed_g}", f"-s{seed_s}"], s)
    s = run_cli(["uniq", "-d", "/"], s)
    args = ["taxa2agg", "-l", str(lb), "-m", method, "-a", strategy,
            "-f", str(factor), str(taxfile)]
    s = run_cli(args, s)
    out = {}
    for block in s.split(">")[1:]:
        lines = block.splitlines()
        out[lines[0]] = int(lines[1])
    return out


@pytest.mark.parametrize("preset", ["max-sensitivity", "high-sensitivity",
                                    "high-precision", "max-precision"])
def test_fused_matches_cli(world, tmp_path, preset):
    tax, table, reads = world
    cfg = PRESETS[preset]
    cli_out = cli_reference_run(
        world, tmp_path, cfg.min_seed_size, cfg.max_gap_size,
        int(cfg.lower_bound), cfg.method, cfg.strategy, cfg.factor)

    groups = [(h, [r1, r2]) for h, r1, r2 in reads]
    fused = dict(analyse_stream(groups, tax, table, preset,
                                batch_size=8, read_length=128))
    assert set(fused) == set(cli_out)
    for h in cli_out:
        assert fused[h] == cli_out[h], (preset, h)


@pytest.mark.parametrize("method,strategy,factor", [
    ("rmq", "lca*", 0.0), ("rmq", "hybrid", 0.5)])
def test_fused_rmq_strategies_match_cli(world, tmp_path, method, strategy, factor):
    """The two RMQ strategies not used by presets, as custom configs."""
    tax, table, reads = world
    cfg = PRESETS["max-sensitivity"]._replace(
        method=method, strategy=strategy, factor=factor, k_max=32)
    cli_out = cli_reference_run(
        world, tmp_path, cfg.min_seed_size, cfg.max_gap_size,
        int(cfg.lower_bound), method, strategy, factor)
    groups = [(h, [r1, r2]) for h, r1, r2 in reads]
    fused = dict(analyse_stream(groups, tax, table, cfg,
                                batch_size=8, read_length=128))
    for h in cli_out:
        assert fused[h] == cli_out[h], (method, strategy, h)


@pytest.mark.parametrize("preset", ["tryptic-sensitivity", "tryptic-precision"])
def test_tryptic_fused_matches_cli(world, tmp_path, preset):
    from umgap_tpu.index.table import PeptideTable
    from umgap_tpu.ops import kmers as kmerops
    from umgap_tpu.pipeline import TRYPTIC_PRESETS, analyse_tryptic_groups

    tax, _ktable, reads = world
    cfg = TRYPTIC_PRESETS[preset]

    # build a tryptic index over fragments of the world proteins
    rng = np.random.default_rng(11)
    frags = {}
    for h, r1, r2 in reads:
        pass
    # digest the source proteins directly (grab them via translating reads)
    seen = set()
    for h, r1, r2 in reads:
        for dna in (r1, r2):
            from umgap_tpu.ops import translate as transmod
            pep = transmod.translate_sequence(
                dna, ["1"], encoding.get_table(1))[0]
            for f in kmerops.tryptic_digest(pep):
                if 9 <= len(f) <= 45 and f not in seen:
                    seen.add(f)
                    frags[f] = int(rng.choice([1001, 1002, 1003, 101, 102]))
    table = PeptideTable.build(list(frags), np.array(list(frags.values()),
                                                    dtype=np.int32))
    taxfile = tmp_path / "taxons.tsv"
    lines = []
    for tid in np.nonzero(tax.present)[0]:
        t = tax.get(int(tid))
        lines.append(
            f"{t.id}\t{t.name}\t{ranks.rank_name(t.rank)}\t{t.parent}\t\x01")
    taxfile.write_text("\n".join(lines) + "\n")
    idxfile = tmp_path / "tryp.npz"
    table.save(idxfile)

    fasta_in = "".join(f">{h}/1\n{r1}\n>{h}/2\n{r2}\n" for h, r1, r2 in reads)
    s = run_cli(["translate", "-a"], fasta_in)
    s = run_cli(["prot2tryp2lca", "-l", "9", "-L", "45", str(idxfile)], s)
    s = run_cli(["uniq", "-d", "/"], s)
    s = run_cli(["taxa2agg", "-l", str(int(cfg.lower_bound)), "-m", "rmq",
                 "-a", "mrtl", str(taxfile)], s)
    cli_out = {}
    for block in s.split(">")[1:]:
        ls = block.splitlines()
        cli_out[ls[0]] = int(ls[1])

    groups = [(h, [r1, r2]) for h, r1, r2 in reads]
    fused = dict(analyse_tryptic_groups(groups, tax, table, cfg, batch_size=8))
    assert set(fused) == set(cli_out)
    for h in cli_out:
        assert fused[h] == cli_out[h], (preset, h)


def test_translate_pipeline_hits_species(world):
    """Sanity: clean reads resolve to their source species or ancestors."""
    tax, table, reads = world
    groups = [(h, [r1, r2]) for h, r1, r2 in reads]
    fused = dict(analyse_stream(groups, tax, table, "max-sensitivity",
                                batch_size=8, read_length=128))
    resolved = [t for t in fused.values() if t > 1]
    assert len(resolved) >= len(reads) // 2


def test_fused_ranked_seedextend_matches_cli(world, tmp_path):
    """Scored seedextend (`-r`) inside the fused pipeline vs the CLI
    composition (VERDICT round-1 item 7)."""
    tax, table, reads = world
    taxfile = tmp_path / "taxons.tsv"
    lines = []
    for tid in np.nonzero(tax.present)[0]:
        t = tax.get(int(tid))
        lines.append(
            f"{t.id}\t{t.name}\t{ranks.rank_name(t.rank)}\t{t.parent}\t\x01")
    taxfile.write_text("\n".join(lines) + "\n")
    idxfile = tmp_path / "idx.npz"
    table.save(idxfile)

    fasta_in = "".join(f">{h}/1\n{r1}\n>{h}/2\n{r2}\n" for h, r1, r2 in reads)
    s = run_cli(["translate", "-a"], fasta_in)
    s = run_cli(["prot2kmer2lca", "-o", str(idxfile)], s)
    s = run_cli(["seedextend", "-g1", "-s2", "-r", str(taxfile)], s)
    s = run_cli(["uniq", "-d", "/"], s)
    s = run_cli(["taxa2agg", "-l", "1", "-m", "rmq", "-a", "mrtl",
                 str(taxfile)], s)
    cli_out = {}
    for block in s.split(">")[1:]:
        ls = block.splitlines()
        cli_out[ls[0]] = int(ls[1])

    cfg = PRESETS["max-sensitivity"]._replace(ranked=True, penalty=5)
    groups = [(h, [r1, r2]) for h, r1, r2 in reads]
    fused = dict(analyse_stream(groups, tax, table, cfg,
                                batch_size=8, read_length=128))
    assert set(fused) == set(cli_out)
    for h in cli_out:
        assert fused[h] == cli_out[h], h
