"""Build-time fingerprint exact-confirm for tryptic indexes.

The reference's FST is exact; the fingerprint PeptideTable becomes
exact-for-indexed-keys by aborting any build where two distinct
peptides collide in the 64-bit double-FNV fingerprint (planted here by
patching the fingerprint function — finding a real simultaneous 2x32-bit
FNV collision is a ~2^32 search, which is the point of the check)."""

import numpy as np
import pytest

from umgap_tpu.index import table as table_mod
from umgap_tpu.index.table import (
    FingerprintCollision,
    PeptideTable,
    _fingerprints,
)


def _planted(monkeypatch, collide_pair):
    """Patch _fingerprints so the two peptides in ``collide_pair`` get
    the same fingerprint; all others keep their real one."""
    a, b = collide_pair

    def fake(peptides, chunk: int = 2_000_000):
        hi, lo = _fingerprints(peptides)
        idx = {p: i for i, p in enumerate(peptides)}
        if a in idx and b in idx:
            hi[idx[b]] = hi[idx[a]]
            lo[idx[b]] = lo[idx[a]]
        return hi, lo

    monkeypatch.setattr(table_mod, "_fingerprints", fake)


def test_collision_aborts_build(monkeypatch):
    peps = ["AAAAAAAAK", "CDEFGHIKL", "MNPQRSTVW"]
    vals = np.array([2, 3, 4], np.int32)
    _planted(monkeypatch, ("AAAAAAAAK", "MNPQRSTVW"))
    with pytest.raises(FingerprintCollision):
        PeptideTable.build(peps, vals)


def test_identical_duplicates_pass(monkeypatch):
    # equal strings sharing a fingerprint are not a collision
    peps = ["AAAAAAAAK", "AAAAAAAAK", "CDEFGHIKL"]
    vals = np.array([2, 2, 3], np.int32)
    t = PeptideTable.build(peps, vals)
    assert t.n == 3


def test_clean_build_unchanged():
    peps = ["AAAAAAAAK", "CDEFGHIKL", "MNPQRSTVW"]
    vals = np.array([2, 3, 4], np.int32)
    t = PeptideTable.build(peps, vals)
    v, f = t.lookup_peptides_host(peps)
    assert list(v) == [2, 3, 4] and f.all()


def test_sharded_build_detects_collision(monkeypatch):
    """The serving-path sharded build runs the same check per shard
    (colliding fingerprints always land in the same shard: the owner is
    a function of the fingerprint)."""
    from umgap_tpu.parallel import build_sharded_peptide_tables

    peps = [f"PEPTIDE{c}K" for c in "ACDEFGHILMNPQRSTVWY"]
    vals = np.arange(2, 2 + len(peps)).astype(np.int32)
    _planted(monkeypatch, (peps[0], peps[7]))
    with pytest.raises(FingerprintCollision):
        build_sharded_peptide_tables(peps, vals, n_shards=4)


def test_check_overhead_small():
    """The exact-confirm pass is an argsort over the fingerprints —
    measured < 5% of the whole build at 200k keys."""
    import time

    rng = np.random.default_rng(9)
    aas = np.array(list("ACDEFGHIKLMNPQRSTVWY"))
    peps = list({"".join(rng.choice(aas, 12)) for _ in range(200_000)})
    vals = rng.integers(1, 1000, size=len(peps)).astype(np.int32)

    t0 = time.perf_counter()
    hi, lo = _fingerprints(peps)
    table_mod._check_fingerprint_collisions(peps, hi, lo)
    t_check_plus_fp = time.perf_counter() - t0
    t1 = time.perf_counter()
    PeptideTable.build(peps, vals, store_keys=False)
    t_build = time.perf_counter() - t1
    # the check alone (minus fingerprinting, which the build pays
    # anyway) is the difference of an argsort; bound it loosely
    t2 = time.perf_counter()
    table_mod._check_fingerprint_collisions(peps, hi, lo)
    t_check = time.perf_counter() - t2
    assert t_check < 0.25 * t_build  # generous CI bound; measured ~2%
