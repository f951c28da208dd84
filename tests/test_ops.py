"""Encoding, translation, k-mer, and lookup op tests."""

import numpy as np
import pytest

from umgap_tpu.index.table import KmerTable, PeptideTable
from umgap_tpu.ops import encoding, kmers, lookup, translate


def test_dna_roundtrip():
    codes = encoding.encode_dna("ACGT*TCGA")
    assert encoding.decode_dna(codes) == "ACGTNTCGA"  # '*' -> N (src/dna/mod.rs:34-44)


def test_complement():
    codes = encoding.encode_dna("TGCANACGT")
    rev = encoding.DNA_COMPLEMENT[codes[::-1]]
    assert encoding.decode_dna(rev) == "ACGTNTGCA"  # src/dna/mod.rs tests


def test_translate_ttg():
    t = encoding.get_table(1)
    codes = encoding.encode_dna("TTG")
    assert encoding.decode_aa(t.translate_frame(codes, False)) == "L"
    assert encoding.decode_aa(t.translate_frame(codes, True)) == "M"


def test_translate_gattacaaa():
    t = encoding.get_table(1)
    out = translate.translate_sequence("GATTACAAA", ["1"], t)
    assert out == ["DYK"]
    out = translate.translate_sequence("GATTACAAA", ["1", "1R"], t)
    assert out == ["DYK", "FVI"]


def test_translate_unknown_codon():
    t = encoding.get_table(1)
    assert translate.translate_sequence("GANTAC", ["1"], t) == ["-Y"]


def test_tables_present():
    present = sorted(encoding.GENETIC_CODES)
    assert present == [1, 2, 3, 4, 5, 6, 9, 10, 11, 12, 13, 14, 15, 16, 21, 22, 23]
    with pytest.raises(ValueError):
        encoding.get_table(7)


def test_translate_frames_offsets():
    t = encoding.get_table(1)
    # frame 2 drops one leading base; frame 3 two
    assert translate.translate_sequence("AACGTACGT", ["1", "2", "3"], t) == [
        "NVR", "TY", "RT"]


def test_translate6_batch_matches_host():
    t = encoding.get_table(1)
    seqs = ["GATTACAAA", "ACGTACGTACGTAGGG", "AC", "CCCTTTGGGAAACCCTTTGG"]
    L = max(len(s) for s in seqs)
    B = len(seqs)
    dna = np.full((B, L), encoding.DNA_N, dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(seqs):
        c = encoding.encode_dna(s)
        dna[i, : len(c)] = c
        lens[i] = len(c)
    aa, plens = translate.translate6_batch(dna, lens, t)
    aa = np.asarray(aa)
    plens = np.asarray(plens)
    for i, s in enumerate(seqs):
        host = translate.translate_sequence(s, list(translate.FRAME_NAMES), t)
        for f in range(6):
            got = encoding.decode_aa(aa[i, f, : plens[i, f]])
            assert got == host[f], (s, translate.FRAME_NAMES[f])


def test_pack_kmers():
    codes = encoding.encode_aa("DAIGDVAKAYKKAG")
    packed = kmers.pack_kmers_host(codes, 9)
    assert len(packed) == 6
    assert kmers.unpack_kmer(packed[0], 9) == "DAIGDVAKA"
    assert kmers.unpack_kmer(packed[5], 9) == "VAKAYKKAG"
    assert len(kmers.pack_kmers_host(encoding.encode_aa("SHORT"), 9)) == 0


def test_pack_windows_batch_matches_host():
    import jax.numpy as jnp

    peps = ["DAIGDVAKAYKKAG", "KKKKKKKKK", "SHORT"]
    P = max(len(p) for p in peps)
    B = len(peps)
    aa = np.full((B, P), encoding.AA_PAD, dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for i, p in enumerate(peps):
        c = encoding.encode_aa(p)
        aa[i, : len(c)] = c
        lens[i] = len(c)
    hi, lo, valid = kmers.pack_windows_batch(jnp.asarray(aa), jnp.asarray(lens), 9)
    hi, lo, valid = np.asarray(hi), np.asarray(lo), np.asarray(valid)
    for i, p in enumerate(peps):
        host = kmers.pack_kmers_host(encoding.encode_aa(p), 9)
        nw = len(host)
        assert valid[i].sum() == nw
        got = kmers.join_packed(hi[i, :nw], lo[i, :nw]) if nw else []
        assert list(got) == list(host)


def test_tryptic_digest():
    seq = ("AYKKAGVSGHVWQSDGITNCLLRGLTRVKEAVANRDSGNGYINKVYYWTVDKRATTRDALDAG"
           "VDGIMTNYPDVITDVLN")
    expect = ["AYK", "K", "AGVSGHVWQSDGITNCLLR", "GLTR", "VK", "EAVANR",
              "DSGNGYINK", "VYYWTVDK", "R", "ATTR", "DALDAGVDGIMTNYPDVITDVLN"]
    assert kmers.tryptic_digest(seq) == expect


def test_tryptic_digest_stops():
    assert kmers.tryptic_digest("AB*CD") == ["AB", "CD"]
    assert kmers.tryptic_digest("") == []


def test_kmer_table_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 1000
    packed = np.unique(rng.integers(0, 2 ** 45, size=2 * n).astype(np.uint64))[:n]
    values = rng.integers(1, 2 ** 31 - 1, size=n).astype(np.int32)
    t = KmerTable.build(packed, values, k=9)
    hi, lo = kmers.split_packed(packed)
    got, found = t.probe_host(hi, lo)
    assert found.all()
    assert (got == values).all()
    # misses
    miss = (packed + np.uint64(1)) % np.uint64(2 ** 45)
    miss_set = set(packed.tolist())
    hi2, lo2 = kmers.split_packed(miss)
    got2, found2 = t.probe_host(hi2, lo2, default=0)
    for m, f, g in zip(miss.tolist(), found2, got2):
        if m not in miss_set:
            assert not f and g == 0
    # save/load
    p = tmp_path / "t.npz"
    t.save(p)
    t2 = KmerTable.load(p)
    assert t2.k == 9
    got3, found3 = t2.probe_host(hi, lo)
    assert (got3 == values).all()


def test_peptide_table():
    peps = ["AAALTER", "ENFVYLAK", "MDGTEYIIVK"]
    vals = np.array([2, 3398, 9606], dtype=np.int32)
    t = PeptideTable.build(peps, vals)
    got, found = t.lookup_peptides_host(peps)
    assert found.all() and (got == vals).all()
    got, found = t.lookup_peptides_host(["NOTAPEPTIDE"], default=0)
    assert not found[0] and got[0] == 0


def test_device_probe_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    n = 5000
    packed = np.unique(rng.integers(0, 2 ** 45, size=2 * n).astype(np.uint64))[:n]
    values = rng.integers(1, 2 ** 31 - 1, size=n).astype(np.int32)
    t = KmerTable.build(packed, values, k=9)
    dt = lookup.DeviceTable.from_host(t)
    queries = np.concatenate([packed[:100], (packed[:100] + np.uint64(7))])
    hi, lo = kmers.split_packed(queries)
    host_vals, host_found = t.probe_host(hi, lo)
    dev_vals, dev_found = lookup.probe(dt, jnp.asarray(hi), jnp.asarray(lo))
    assert (np.asarray(dev_vals) == host_vals).all()
    assert (np.asarray(dev_found) == host_found).all()


def test_bucket4_table_roundtrip():
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    n = 3000
    packed = np.unique(rng.integers(0, 2 ** 45, size=2 * n).astype(np.uint64))[:n]
    values = rng.integers(1, 2 ** 31 - 1, size=n).astype(np.int32)
    t = KmerTable.build(packed, values, k=9, bucket=4)
    assert t.bucket == 4
    hi, lo = kmers.split_packed(packed)
    got, found = t.probe_host(hi, lo)
    assert found.all() and (got == values).all()
    dt = lookup.DeviceTable.from_host(t)
    dev_vals, dev_found = lookup.probe(dt, jnp.asarray(hi), jnp.asarray(lo))
    assert (np.asarray(dev_vals) == values).all()
    # printindex reconstruction stays exact with 4-slot buckets
    pk, pv = t.items()
    order = np.argsort(pk)
    assert set(pk.tolist()) == set(packed.tolist())


def test_device_probe_valid_mask():
    import jax.numpy as jnp

    packed = np.array([123456789], dtype=np.uint64)
    t = KmerTable.build(packed, np.array([42], dtype=np.int32), k=9)
    dt = lookup.DeviceTable.from_host(t)
    hi, lo = kmers.split_packed(np.array([123456789, 123456789], dtype=np.uint64))
    vals, found = lookup.probe(
        dt, jnp.asarray(hi), jnp.asarray(lo), valid=jnp.array([True, False])
    )
    assert np.asarray(vals).tolist() == [42, 0]
    assert np.asarray(found).tolist() == [True, False]


def test_cuckoo_table_roundtrip(tmp_path):
    import jax.numpy as jnp

    from umgap_tpu.index.table import CuckooKmerTable, build_kmer_table, load_table

    rng = np.random.default_rng(7)
    n = 40_000  # dense enough to exercise the eviction tail
    packed = np.unique(rng.integers(0, 2 ** 45, size=2 * n).astype(np.uint64))[:n]
    values = rng.integers(1, 2 ** 30, size=n).astype(np.int32)
    t = build_kmer_table(packed, values, k=9, layout="cuckoo")
    assert isinstance(t, CuckooKmerTable)
    hi, lo = kmers.split_packed(packed)
    got, found = t.probe_host(hi, lo)
    assert found.all() and (got == values).all()
    # misses are exact (no false positives possible)
    key_set = set(packed.tolist())
    miss = (packed + np.uint64(1)) % np.uint64(2 ** 45)
    hi2, lo2 = kmers.split_packed(miss)
    got2, found2 = t.probe_host(hi2, lo2, default=0)
    for m, f, g in zip(miss.tolist(), found2, got2):
        if m not in key_set:
            assert not f and g == 0
    # device probe parity
    dt = lookup.DeviceTable.from_host(t)
    dv, df = lookup.probe(dt, jnp.asarray(hi), jnp.asarray(lo))
    assert (np.asarray(dv) == values).all() and np.asarray(df).all()
    dv2, df2 = lookup.probe(dt, jnp.asarray(hi2), jnp.asarray(lo2))
    assert (np.asarray(dv2) == got2).all() and (np.asarray(df2) == found2).all()
    # items() reconstructs every key exactly
    pk, pv = t.items()
    assert set(pk.tolist()) == key_set
    vals_by_key = dict(zip(packed.tolist(), values.tolist()))
    assert all(vals_by_key[k] == v for k, v in zip(pk.tolist(), pv.tolist()))
    # save/load
    p = tmp_path / "c.npz"
    t.save(p)
    t2 = load_table(p)
    assert isinstance(t2, CuckooKmerTable) and t2.k == 9
    got3, _ = t2.probe_host(hi, lo)
    assert (got3 == values).all()


def test_cuckoo_valid_mask():
    import jax.numpy as jnp

    from umgap_tpu.index.table import CuckooKmerTable

    packed = np.array([987654321], dtype=np.uint64)
    t = CuckooKmerTable.build(packed, np.array([42], dtype=np.int32), k=9)
    dt = lookup.DeviceTable.from_host(t)
    hi, lo = kmers.split_packed(np.array([987654321, 987654321], np.uint64))
    valid = jnp.asarray(np.array([True, False]))
    vals, found = lookup.probe(dt, jnp.asarray(hi), jnp.asarray(lo),
                               valid=valid, default=0)
    assert np.asarray(vals).tolist() == [42, 0]
    assert np.asarray(found).tolist() == [True, False]


def test_translate6_batch_long_reads():
    """L > 160 takes the gather revcomp path (no O(L^2) selector)."""
    rng = np.random.default_rng(9)
    t = encoding.get_table(1)
    B, L = 5, 300
    dna = np.full((B, L), encoding.DNA_N, dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    seqs = []
    for i in range(B):
        n = int(rng.integers(1, L + 1))
        s = "".join(rng.choice(list("ACGTN"), size=n))
        seqs.append(s)
        c = encoding.encode_dna(s)
        dna[i, :n] = c
        lens[i] = n
    aa, plens = translate.translate6_batch(dna, lens, t)
    aa = np.asarray(aa)
    plens = np.asarray(plens)
    for i, s in enumerate(seqs):
        host = translate.translate_sequence(s, list(translate.FRAME_NAMES), t)
        for f in range(6):
            got = encoding.decode_aa(aa[i, f, : plens[i, f]])
            assert got == host[f], (i, translate.FRAME_NAMES[f])


def test_bucket8s_stash_probe_device_and_host():
    """Single-gather bucket-8 layout with a non-empty overflow stash:
    every key (in-bucket and stashed) must resolve on host and device,
    and printindex reconstruction must cover the stash too."""
    import jax.numpy as jnp

    from umgap_tpu.index.table import KmerTable

    rng = np.random.default_rng(5)
    n = 100_000
    packed = np.unique(
        rng.integers(0, 2 ** 45, size=2 * n).astype(np.uint64))[:n]
    values = rng.integers(1, 2 ** 24, size=n).astype(np.int32)
    # fixed tight-ish capacity -> a handful of bucket overflows -> stash
    t = KmerTable.build(packed, values, k=9, bucket=8, max_probe_limit=0,
                        capacity=1 << 18, stash_cap=256)
    assert t.max_probes == 0
    assert len(t.stash_hi) > 0, "capacity chosen to force a stash"
    dt = lookup.DeviceTable.from_host(t)
    hi, lo = kmers.split_packed(packed)
    hv, hf = t.probe_host(hi, lo)
    assert hf.all()
    assert (hv == values).all()
    dv, df = lookup.probe(dt, jnp.asarray(hi), jnp.asarray(lo))
    assert np.asarray(df).all()
    assert (np.asarray(dv) == values).all()
    # misses (keys guaranteed absent) return default and found=False
    absent = packed[:500] ^ np.uint64(1 << 44)
    absent = absent[~np.isin(absent, packed)]
    ahi, alo = kmers.split_packed(absent)
    av, af = lookup.probe(dt, jnp.asarray(ahi), jnp.asarray(alo), default=0)
    assert not np.asarray(af).any()
    assert (np.asarray(av) == 0).all()
    # items() reconstruction includes stash entries
    got_keys, got_vals = t.items()
    order = np.argsort(got_keys)
    assert (got_keys[order] == np.sort(packed)).all()
    m = {int(k): int(v) for k, v in zip(packed, values)}
    assert all(m[int(k)] == int(v) for k, v in zip(got_keys, got_vals))


def test_bucket8s_degrades_to_bucket64s_geometry(monkeypatch):
    """Past the cache-regime key threshold the default bucket8s layout
    must route to the at-scale bucket64s geometry instead of failing
    (exercised at small scale by patching the threshold)."""
    from umgap_tpu.index import table as table_mod

    rng = np.random.default_rng(6)
    n = 50_000
    packed = np.unique(
        rng.integers(0, 2 ** 45, size=2 * n).astype(np.uint64))[:n]
    values = rng.integers(1, 2 ** 24, size=n).astype(np.int32)
    monkeypatch.setattr(table_mod, "BUCKET8S_MAX_KEYS", 10_000)
    t = table_mod.build_kmer_table(packed, values, k=9)
    assert t.bucket == 64
    assert t.max_probes == 0
    hv, hf = t.probe_host(*kmers.split_packed(packed))
    assert hf.all() and (hv == values).all()


def test_pinned_capacity_respects_remainder_floor():
    """A caller-pinned capacity below bucket << MIN_NB_BITS must be
    floored: nb_bits < 15 would make the 31-bit remainder alias the
    probe-distance tag (bit 30), corrupting items() reconstruction and
    risking probe false positives (found via printindex over bucket16
    distbuild shards)."""
    from umgap_tpu.index.table import MIN_NB_BITS, KmerTable

    rng = np.random.default_rng(41)
    n = 60_000
    packed = np.unique(
        rng.integers(0, 2 ** 45, size=2 * n).astype(np.uint64))[:n]
    values = rng.integers(1, 1 << 22, size=n).astype(np.int32)
    t = KmerTable.build(packed, values, k=9, bucket=16,
                        max_probe_limit=1, stash_cap=256,
                        capacity=1 << 18)  # would be nb_bits=14
    assert t.nb_bits >= MIN_NB_BITS
    assert t.capacity == 16 << MIN_NB_BITS
    hv, hf = t.probe_host(*kmers.split_packed(packed))
    assert hf.all() and (hv == values).all()
    got_keys, got_vals = t.items()
    order = np.argsort(got_keys)
    assert (got_keys[order] == np.sort(packed)).all()
    m = {int(k): int(v) for k, v in zip(packed, values)}
    assert all(m[int(k)] == int(v) for k, v in zip(got_keys, got_vals))
