"""Sharded taxa2freq vs the host CLI command: CSV byte-equality on an
8-device virtual mesh (VERDICT round-1 item 5)."""

import io

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from umgap_tpu import ranks
from umgap_tpu.cli import main
from umgap_tpu.parallel.freq import sharded_taxa2freq_csv
from umgap_tpu.taxonomy import Taxon, Taxonomy


@pytest.fixture(scope="module")
def tax():
    rng = np.random.default_rng(3)
    taxa = [Taxon(1, "root", ranks.NO_RANK, 1, True)]
    for i in range(2, 5001):
        parent = int(rng.integers(1, i))
        rank = int(rng.integers(0, ranks.RANK_COUNT))
        valid = bool(rng.random() > 0.1)
        taxa.append(Taxon(i, f"name {i}", rank, parent, valid))
    return Taxonomy(taxa)


@pytest.fixture(scope="module")
def taxfile(tmp_path_factory, tax):
    p = tmp_path_factory.mktemp("freq") / "taxons.tsv"
    lines = []
    for i in np.nonzero(tax.present)[0]:
        t = tax.get(int(i))
        valid = "\x01" if t.valid else "\x00"
        lines.append(f"{t.id}\t{t.name}\t{ranks.rank_name(t.rank)}\t"
                     f"{t.parent}\t{valid}")
    p.write_text("\n".join(lines) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("x",))


def _host_csv(taxfile, rank_name, files, min_freq=1):
    argv = ["taxa2freq", "-r", rank_name, "-f", str(min_freq), taxfile]
    argv += [str(f) for f in files]
    out = io.StringIO()
    rc = main(argv, stdin=io.StringIO(""), stdout=out)
    assert rc == 0
    return out.getvalue()


def test_sharded_matches_host_csv(tax, taxfile, mesh, tmp_path):
    rng = np.random.default_rng(0)
    files = []
    files_taxa = []
    for i in range(3):
        n = int(rng.integers(500, 2000))
        taxa = rng.integers(1, tax.size, size=n)
        path = tmp_path / f"f{i}.txt"
        path.write_text("".join(f"{t}\n" for t in taxa))
        files.append(path)
        files_taxa.append(taxa)

    rank_name = "family"
    expected = _host_csv(taxfile, rank_name, files)
    got = sharded_taxa2freq_csv(
        tax, ranks.rank_index(rank_name), files_taxa,
        [str(f) for f in files], mesh, min_frequency=1)
    assert got == expected


def test_sharded_matches_host_csv_species_f0(tax, taxfile, mesh, tmp_path):
    rng = np.random.default_rng(1)
    taxa = rng.integers(1, tax.size, size=4000)
    path = tmp_path / "s.txt"
    path.write_text("".join(f"{t}\n" for t in taxa))
    expected = _host_csv(taxfile, "species", [path], min_freq=0)
    got = sharded_taxa2freq_csv(
        tax, ranks.rank_index("species"), [taxa], [str(path)], mesh,
        min_frequency=0)
    assert got == expected


def test_unknown_key_errors_like_host(tax, mesh):
    """Taxa snapping to nothing produce count key 0; with no taxon 0 in
    the taxonomy both paths raise the reference's error
    (src/commands/taxa2freq.rs:138)."""
    from umgap_tpu.cli import CliError

    taxa = np.array([tax.size + 10, tax.size + 11])
    with pytest.raises(CliError, match="not in taxon list"):
        sharded_taxa2freq_csv(tax, ranks.rank_index("species"), [taxa],
                              ["stdin"], mesh, min_frequency=0)
