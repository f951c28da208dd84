"""Distributed index-build job: correctness vs the single-host build,
TSV input mode, and resume after a killed driver/worker."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from umgap_tpu.index import distbuild
from umgap_tpu.index.scale import join_kmers_sorted
from umgap_tpu.ops import kmers as kmerops
from umgap_tpu.taxonomy import Taxonomy, read_taxa_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def _drive(workdir, *extra):
    return subprocess.run(
        [sys.executable, "-m", "umgap_tpu", "buildindex-dist",
         "--workdir", str(workdir), *extra],
        env=ENV, capture_output=True, text=True)


def _all_rows(manifest):
    keys, tids = [], []
    for c in range(manifest["n_chunks"]):
        rows = min(manifest["rows_per_chunk"],
                   manifest["total_rows"] - c * manifest["rows_per_chunk"])
        k, t = distbuild.synthetic_chunk(manifest["seed"], c, rows,
                                         manifest["n_tax"])
        keys.append(k)
        tids.append(t)
    return np.concatenate(keys), np.concatenate(tids)


@pytest.mark.multiprocess
def test_distbuild_matches_single_host(tmp_path):
    wd = tmp_path / "job"
    r = _drive(wd, "--synthetic", "3e5", "--shards", "4",
               "--workers", "2")
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    manifest = json.load(open(wd / "manifest.json"))

    # oracle: one single-host join over the same rows
    packed, tids = _all_rows(manifest)
    order = np.argsort(packed, kind="stable")
    tax = Taxonomy(read_taxa_file(manifest["taxons"]))
    ekeys, evals = join_kmers_sorted(packed[order],
                                     tids[order].astype(np.int64), tax)
    assert out["n_keys"] == len(ekeys)

    # every key probes to the oracle value through its owner shard
    shards = distbuild.load_shards(str(wd))
    from umgap_tpu.parallel.sharded import owner_of

    hi, lo = kmerops.split_packed(ekeys.astype(np.uint64))
    owner = owner_of(hi, lo, manifest["n_shards"])
    for s, t in enumerate(shards):
        sel = owner == s
        v, f = t.probe_host(hi[sel], lo[sel])
        assert f.all()
        assert (v == evals[sel]).all()
    # shards stack rectangular for serving
    assert len({t.capacity for t in shards}) == 1


@pytest.mark.multiprocess
def test_distbuild_tsv_input(tmp_path):
    taxfile = tmp_path / "taxons.tsv"
    taxfile.write_text(
        "1\troot\tno rank\t1\t\x01\n2\tBacteria\tsuperkingdom\t1\t\x01\n"
        "3\tFirmicutes\tphylum\t2\t\x01\n")
    tsv = tmp_path / "seqs.tsv"
    rng = np.random.default_rng(3)
    with open(tsv, "w") as f:
        for i in range(200):
            prot = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), 20))
            f.write(f"{rng.integers(2, 4)}\t{prot}\n")
    wd = tmp_path / "job"
    r = _drive(wd, "--tsv", str(tsv), "--taxons", str(taxfile),
               "--shards", "2", "--workers", "2")
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n_keys"] > 1000  # ~200 * 12 distinct 9-mers

    # spot-check one row's k-mers resolve
    shards = distbuild.load_shards(str(wd))
    from umgap_tpu.io import native
    from umgap_tpu.parallel.sharded import owner_of

    packed, tids = native.split_kmers_tsv(tsv.read_bytes(), k=9)
    hi, lo = kmerops.split_packed(packed)
    owner = owner_of(hi, lo, 2)
    found = 0
    for s, t in enumerate(shards):
        sel = owner == s
        _v, f = t.probe_host(hi[sel], lo[sel])
        found += int(f.sum())
    assert found == len(packed)  # every input k-mer is indexed


@pytest.mark.multiprocess
def test_distbuild_resume_after_kill(tmp_path):
    """Kill the driver (and its workers) mid-job; a re-run with the
    same command must finish from the checkpoints and match an
    uninterrupted build byte-for-byte."""
    wd = tmp_path / "job"
    args = ["--synthetic", "3e5", "--shards", "4", "--workers", "2",
            "--seed", "7"]
    proc = subprocess.Popen(
        [sys.executable, "-m", "umgap_tpu", "buildindex-dist",
         "--workdir", str(wd), *args],
        env=ENV, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True)
    # let it get through part of the job, then kill the whole group
    deadline = time.time() + 60
    while time.time() < deadline:
        if (wd / "part").exists() and any((wd / "part").glob("*.done")):
            break
        time.sleep(0.1)
    os.killpg(proc.pid, signal.SIGKILL)
    proc.wait()
    # the kill must land BEFORE the job completed, or the resume path
    # under test is not exercised
    assert len(list((wd / "shards").glob("*.done"))) < 4

    done_before = len(list((wd / "part").glob("*.done")))
    r = _drive(wd, *args)
    assert r.returncode == 0, r.stderr
    assert done_before >= 1  # the first run really made progress

    # compare against an uninterrupted build
    wd2 = tmp_path / "job2"
    r2 = _drive(wd2, *args)
    assert r2.returncode == 0, r2.stderr
    for s in range(4):
        a = np.load(wd / "shards" / f"shard_{s:03d}.npz")
        b = np.load(wd2 / "shards" / f"shard_{s:03d}.npz")
        assert (a["rows"] == b["rows"]).all()  # packed wire layout


@pytest.mark.multiprocess
def test_distbuild_artifacts_serve_on_mesh(tmp_path):
    """Built shard artifacts load straight into the serving-time
    ShardedTable (same owner function end to end): every indexed key
    resolves through the all-to-all probe on the 8-device mesh."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    wd = tmp_path / "job"
    r = _drive(wd, "--synthetic", "2e5", "--shards", "8", "--workers", "2")
    assert r.returncode == 0, r.stderr

    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from umgap_tpu.parallel import ShardedTable, make_mesh
    from umgap_tpu.parallel.sharded import sharded_probe_local

    shards = distbuild.load_shards(str(wd))
    mesh = make_mesh(8)
    stable = ShardedTable.from_shards(shards, mesh)

    joined = [np.load(wd / "joined" / f"s{s:03d}.npz") for s in range(8)]
    keys = np.concatenate([z["keys"] for z in joined]).astype(np.uint64)
    vals = np.concatenate([z["values"] for z in joined])
    sel = np.random.default_rng(0).choice(len(keys), 4096, replace=False)
    hi, lo = kmerops.split_packed(keys[sel])

    def local(hi, lo, rows, stash):
        return sharded_probe_local(
            hi, lo, jnp.ones_like(hi, bool), rows[0], stable.max_probes,
            "x", kind=stable.kind, nb_bits=stable.nb_bits,
            bucket=stable.bucket, shard_stash=stash[0])

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("x"), P("x"), P("x", None, None), P("x", None, None)),
        out_specs=(P("x"), P("x")), check_vma=False)
    got_v, got_f = fn(jnp.asarray(hi.astype(np.int32)),
                      jnp.asarray(lo.astype(np.int32)),
                      stable.rows, stable.stash)
    assert np.asarray(got_f).all()
    assert (np.asarray(got_v) == vals[sel]).all()


@pytest.mark.multiprocess
def test_printindex_over_shards_dir(tmp_path):
    """printindex accepts a buildindex-dist workdir and streams the
    merged key-sorted (kmer, taxon) pairs — matching the per-shard
    joined outputs exactly."""
    import io

    from umgap_tpu.cli import main as cli_main

    wd = tmp_path / "job"
    r = _drive(wd, "--synthetic", "5e4", "--shards", "2", "--workers", "2")
    assert r.returncode == 0, r.stderr
    out = io.StringIO()
    rc = cli_main(["printindex", str(wd)], stdin=io.StringIO(""),
                  stdout=out)
    assert rc == 0
    lines = out.getvalue().splitlines()
    joined = [np.load(wd / "joined" / f"s{s:03d}.npz") for s in range(2)]
    keys = np.concatenate([z["keys"] for z in joined]).astype(np.uint64)
    vals = np.concatenate([z["values"] for z in joined])
    order = np.argsort(keys)
    expect = [f"{kmerops.unpack_kmer(int(k), 9)}\t{int(v)}"
              for k, v in zip(keys[order], vals[order])]
    assert lines == expect  # packed-key order, same as the single-table path


@pytest.mark.multiprocess
def test_distbuild_bucket64d_reclaim_input(tmp_path):
    """Dense-layout build through the TSV path with --reclaim-input:
    every input k-mer resolves exactly through its owner shard, shards
    share the bucket64d geometry, and the consumed TSV's disk blocks
    are progressively hole-punched (file size/offsets unchanged, so the
    manifest's chunk ranges stay resume-valid)."""
    taxfile = tmp_path / "taxons.tsv"
    distbuild.write_synthetic_taxonomy(str(taxfile), 2000, seed=7)
    tsv = tmp_path / "seqs.tsv"
    rng = np.random.default_rng(21)
    aa = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    with open(tsv, "wb") as f:
        for _ in range(19_000):       # ~6 MB -> 2-3 chunks at 3 MB
            prot = aa[rng.integers(0, 20, size=300)].tobytes()
            f.write(b"%d\t%s\n" % (rng.integers(2, 2000), prot))
    size = os.path.getsize(tsv)
    blocks_before = os.stat(tsv).st_blocks
    wd = tmp_path / "job"
    manifest = distbuild.drive(
        str(wd), str(tsv), str(taxfile), n_shards=2, workers=2,
        chunk_bytes=3 << 20, layout="bucket64d", reclaim=True,
        reclaim_input=True)
    assert manifest["n_keys"] > 5_000_000
    # punch freed >= 1 MB per full chunk; size and ranges unchanged
    assert os.path.getsize(tsv) == size
    assert os.stat(tsv).st_blocks <= blocks_before - (1 << 20) // 512

    shards = distbuild.load_shards(str(wd))
    assert all(t.bucket == 64 for t in shards)
    assert len({t.capacity for t in shards}) == 1
    # probe depth is the LAYOUT's declared depth on every shard, not
    # the realized displacement depth: at mid load one shard can place
    # all keys home (realized 0) while a sibling displaces (realized 1)
    # — from_shards would refuse that as a layout mix
    assert all(t.max_probes == distbuild.PROBE_LIMITS["bucket64d"]
               for t in shards)

    from umgap_tpu.io import native
    from umgap_tpu.parallel.sharded import owner_of

    # the punched TSV is gone — regenerate the identical rows
    rng = np.random.default_rng(21)
    chunks = []
    for _ in range(19_000):
        prot = aa[rng.integers(0, 20, size=300)].tobytes()
        chunks.append(b"%d\t%s\n" % (rng.integers(2, 2000), prot))
    packed, _tids = native.split_kmers_tsv(b"".join(chunks), k=9)
    hi, lo = kmerops.split_packed(packed)
    owner = owner_of(hi, lo, 2)
    for s, t in enumerate(shards):
        sel = owner == s
        _v, f = t.probe_host(hi[sel], lo[sel])
        assert f.all()


@pytest.mark.multiprocess
def test_densify_relayout_in_place(tmp_path):
    """--densify converts a bucket64s workdir to the dense geometry in
    place: capacity shrinks, every key still probes to its exact value,
    the manifest records the new layout, and a second run is a no-op."""
    wd = tmp_path / "job"
    r = _drive(wd, "--synthetic", "5e6", "--shards", "2",
               "--workers", "2", "--layout", "bucket64s")
    assert r.returncode == 0, r.stderr
    before = distbuild.load_shards(str(wd))
    truth = [t.items() for t in before]
    cap_before = before[0].capacity
    del before

    r = _drive(wd, "--densify")
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["densified"] == 2
    manifest = json.load(open(wd / "manifest.json"))
    assert manifest["layout"] == "bucket64d"
    assert manifest["capacity"] < cap_before

    after = distbuild.load_shards(str(wd))
    assert all(t.capacity == manifest["capacity"] for t in after)
    assert all(t.max_probes == distbuild.PROBE_LIMITS["bucket64d"]
               for t in after)
    for t, (keys, vals) in zip(after, truth):
        assert t.n == len(keys)
        hi, lo = kmerops.split_packed(keys.astype(np.uint64))
        v, f = t.probe_host(hi, lo)
        assert f.all()
        assert (v == vals).all()

    r = _drive(wd, "--densify")
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout.strip().splitlines()[-1])["densified"] == 0
