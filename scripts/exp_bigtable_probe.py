"""Serving at production geometry on the real chip (VERDICT r3 next #3).

Loads G bucket16 shards of the at-scale ``buildindex-dist`` artifact
into ONE grouped DeviceTable (G * ~4.3 GB of HBM — the production
per-chip working set, ~300x the 42 MB table every previous on-chip
number used) and measures, on the real TPU:

  1. cold-start: mmap load -> packed rows -> device_put (the
     host->HBM transfer bound, VERDICT next #6's datapoint),
  2. raw probe rate (keys/s) at the bucket16 2-gather probe with the
     REAL stash sizes, vs the same batch on a small table,
  3. the full high-sensitivity pipeline step time with the grouped
     table in place of the bench table.

Traffic note: queries are the bench workload's k-mers routed as the
serving mesh would route them; keys owned by shards OUTSIDE the loaded
group probe a wrong sub-table, which returns garbage VALUES but
executes the identical gather pattern — this experiment measures time,
not values (values at this geometry are exercised for the loaded
group's own keys, checked below).

Usage: python scripts/exp_bigtable_probe.py <workdir> [n_group=3] [base=0]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    workdir = sys.argv[1]
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    base = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    import jax
    import jax.numpy as jnp

    from umgap_tpu.index.table import load_table
    from umgap_tpu.ops import kmers as kmerops, lookup
    from umgap_tpu.parallel.sharded import owner_of

    with open(os.path.join(workdir, "manifest.json")) as f:
        manifest = json.load(f)
    S = manifest["n_shards"]
    out = {"n_shards": S, "group": G, "base": base}

    def eprint(m):
        print(f"[bigtable] {m}", file=sys.stderr, flush=True)

    # --- 1. cold-start: mmap -> packed rows -> HBM --------------------- #
    t0 = time.perf_counter()
    shards = [load_table(os.path.join(workdir, "shards",
                                      f"shard_{base + g:03d}.npz"),
                         mmap=True)
              for g in range(G)]
    t_map = time.perf_counter() - t0
    nb = shards[0].n_buckets
    nbits = shards[0].nb_bits
    bucket = shards[0].bucket
    # pack and read timed separately: on packed artifacts pack_rows
    # returns the mmap'd wire rows untouched (~0 s — the round-5
    # claim), and the concatenate is the unavoidable disk page-in +
    # host assembly of the grouped table
    t0 = time.perf_counter()
    packed = [lookup.pack_rows(t) for t in shards]
    t_pack = time.perf_counter() - t0
    t0 = time.perf_counter()
    rows = np.concatenate(packed)
    t_read = time.perf_counter() - t0
    del packed
    stash_rows = []
    for t in shards:
        if len(t.stash_hi):
            stash_rows.append(np.stack(
                [t.stash_hi, t.stash_lo, t.stash_val], axis=1))
    stash = (np.concatenate(stash_rows).astype(np.int32)
             if stash_rows else np.zeros((0, 3), np.int32))
    gb = rows.nbytes / 1e9
    t0 = time.perf_counter()
    drows = jax.device_put(rows)
    dstash = jax.device_put(stash)
    jax.block_until_ready((drows, dstash))
    # axon block_until_ready may not block: checksum is the barrier
    _ = int(np.asarray(jnp.sum(drows[:: max(1, rows.shape[0] // 1024)])))
    t_put = time.perf_counter() - t0
    max_probes = max(t.max_probes for t in shards)
    out["cold_start"] = {
        "mmap_s": round(t_map, 2), "pack_rows_s": round(t_pack, 2),
        "read_assemble_s": round(t_read, 2),
        "device_put_s": round(t_put, 2), "table_gb": round(gb, 2),
        "put_gbps": round(gb / t_put, 2),
        # n_keys lands in the manifest when the whole drive completes;
        # a mid-build run (measuring finished shards early) lacks it
        "keys_per_shard": (manifest.get("n_keys") or 0) // S,
        "stash_slots": int(stash.shape[0]),
        "max_probes": max_probes,
    }
    eprint(f"cold start: {out['cold_start']}")
    del rows, shards

    # probe depth from the artifact itself (a hard-coded 1 would force
    # a useless second gather round on single-round layouts)
    dtable = lookup.DeviceTable(drows, max_probes=max_probes, kind="kmer",
                                nb_bits=nbits, bucket=bucket,
                                stash=dstash, group=G)

    # --- queries: bench-workload k-mer traffic ------------------------- #
    data = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_data")
    NQ = 1 << 22
    rng = np.random.default_rng(1)
    if os.path.exists(os.path.join(data, "index_keys.bin")):
        wl = np.fromfile(os.path.join(data, "index_keys.bin"), np.uint64)
        qk = wl[rng.integers(0, len(wl), NQ)]
    else:
        qk = rng.integers(0, 2 ** 45, size=NQ).astype(np.uint64)
    hi, lo = kmerops.split_packed(qk)

    # the table rides as a jit ARGUMENT (a closed-over table would be
    # captured as a 12.9GB program constant)
    @jax.jit
    def probe_grouped(tbl, h, l):
        own = owner_of(h, l, S)
        sub = jnp.clip(own - jnp.int32(base), 0, G - 1)
        v, f = lookup.probe(tbl, h, l, sub=sub)
        return v.sum() + f.sum()

    dh = jax.device_put(hi)
    dl = jax.device_put(lo)
    eprint("compiling grouped probe...")
    np.asarray(probe_grouped(dtable, dh, dl))
    reps = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 6.0:
        np.asarray(probe_grouped(dtable, dh, dl))
        reps += 1
    dt = (time.perf_counter() - t0) / reps
    out["probe"] = {
        "queries": NQ,
        "ms_per_4M": round(dt * 1e3, 2),
        "keys_per_s": round(NQ / dt / 1e6, 1),
        "unit": "M keys/s",
    }
    eprint(f"grouped bucket16 probe at {gb:.1f} GB: {out['probe']}")

    # value correctness for keys the loaded group owns
    from umgap_tpu.index.table import load_table as lt

    t0s = lt(os.path.join(workdir, "shards", f"shard_{base:03d}.npz"),
             mmap=True)
    pk, pv = t0s.items()
    sel = rng.integers(0, len(pk), 4096)
    shi, slo = kmerops.split_packed(pk[sel].astype(np.uint64))
    own = owner_of(shi, slo, S)
    sub = np.clip(own - base, 0, G - 1)
    v, f = lookup.probe(dtable, jnp.asarray(shi), jnp.asarray(slo),
                        sub=jnp.asarray(sub))
    ok = bool(np.asarray(f).all()
              and np.array_equal(np.asarray(v), pv[sel]))
    out["owned_key_values_exact"] = ok
    eprint(f"owned-key value check: {ok}")

    # --- 3. full pipeline step at this geometry ------------------------ #
    if os.path.exists(os.path.join(data, "reads.bin")):
        from umgap_tpu import ranks
        from umgap_tpu.agg import device as devagg
        from umgap_tpu.ops import seedextend, translate, encoding as enc
        from umgap_tpu.taxonomy import Taxon, Taxonomy
        import json as jsonmod

        with open(os.path.join(data, "manifest.json")) as f:
            man = jsonmod.load(f)
        P, L, n_tax = man["n_pairs"], man["read_len"], man["n_tax"]
        parent = np.fromfile(os.path.join(data, "parent.bin"), np.int32)
        snap = np.fromfile(os.path.join(data, "snap.bin"), np.int32)
        taxa = [Taxon(i, f"t{i}", ranks.NO_RANK if i % 3 else 14,
                      int(parent[i]), bool(snap[i] == i))
                for i in range(1, n_tax + 1)]
        dtax = devagg.DeviceTaxonomy.from_host(Taxonomy(taxa))
        reads = np.fromfile(os.path.join(data, "reads.bin"),
                            np.uint8).reshape(P, 2, L)
        from umgap_tpu.pipeline import PRESETS

        config = PRESETS["high-sensitivity"]
        tt = enc.get_table(config.table_number)

        @jax.jit
        def step_full(tbl, dtx, dna, lengths):
            Bq, E, l = dna.shape
            aa, plens = translate.translate6_batch(
                dna.reshape(Bq * E, l), lengths.reshape(Bq * E), tt)
            h, l2, wvalid = kmerops.pack_windows_batch(aa, plens, config.k)
            own = owner_of(h, l2, S)
            sub = jnp.clip(own - jnp.int32(base), 0, G - 1)
            tx, _f = lookup.probe(tbl, h, l2, valid=wvalid, sub=sub)
            tx = jnp.where(wvalid, tx, 0)
            W = tx.shape[-1]
            nk = jnp.maximum(plens - (config.k - 1), 0)
            keep = seedextend.seedextend_mask_batch(
                tx, nk, config.min_seed_size, config.max_gap_size)
            hits = jnp.where(keep, tx, 0).reshape(Bq, E * 6 * W)
            ut, uc, uv = devagg.dedup_counts(
                hits, jnp.ones_like(hits, jnp.float32), config.k_max)
            uv = devagg.filter_lower_bound(uc, uv, config.lower_bound)
            agg = devagg.aggregate_batch(
                dtx, ut, uc, uv, config.method, config.strategy,
                config.factor)
            sn = devagg.snap_batch(dtx.snap_valid, agg, default=0)
            return jnp.where(uv.any(-1), sn, 1).astype(jnp.int32).sum()

        # Round 5: the chunked probe (lookup.PROBE_CHUNK_BYTES) bounds
        # the gathered-row buffer, so 16k-pair programs fit HBM beside
        # a 12.9 GB resident table (r4 had to halve to 8k). Walk down
        # only if even that fails.
        @jax.jit
        def step_probe(tbl, dna, lengths):
            Bq, E, l = dna.shape
            aa, plens = translate.translate6_batch(
                dna.reshape(Bq * E, l), lengths.reshape(Bq * E), tt)
            h, l2, wvalid = kmerops.pack_windows_batch(aa, plens, config.k)
            own = owner_of(h, l2, S)
            sub = jnp.clip(own - jnp.int32(base), 0, G - 1)
            tx, f = lookup.probe(tbl, h, l2, valid=wvalid, sub=sub)
            return tx.sum() + f.sum()

        @jax.jit
        def step_translate(dna, lengths):
            Bq, E, l = dna.shape
            aa, plens = translate.translate6_batch(
                dna.reshape(Bq * E, l), lengths.reshape(Bq * E), tt)
            return aa.astype(jnp.int32).sum() + plens.sum()

        for B in (16384, 8192, 4096, 2048):
            ddna = jax.device_put(reads[:B])
            dlen = jax.device_put(np.full((B, 2), L, np.int32))
            stages = (("full", lambda: step_full(
                           dtable, dtax, ddna, dlen)),
                      ("translate", lambda: step_translate(
                           ddna, dlen)),
                      ("translate+probe", lambda: step_probe(
                           dtable, ddna, dlen)))
            # EVERY stage program must compile+fit at this batch before
            # any is timed — an OOM in a later stage walks down to the
            # next batch size instead of losing the run
            try:
                for nm, fn in stages:
                    eprint(f"compiling stage {nm} (B={B}) at "
                           "production geometry...")
                    np.asarray(fn())
            except Exception as e:  # noqa: BLE001 — OOM: try smaller
                eprint(f"B={B} failed ({str(e)[:120]})")
                continue
            stage_ms = {}
            for nm, fn in stages:
                reps = 0
                t0 = time.perf_counter()
                while time.perf_counter() - t0 < 6.0:
                    np.asarray(fn())
                    reps += 1
                stage_ms[nm] = round(
                    (time.perf_counter() - t0) / reps * 1e3, 2)
            dt = stage_ms["full"] / 1e3
            out["pipeline"] = {
                "batch": B,
                "ms_per_batch": stage_ms["full"],
                "pairs_per_s": round(B / dt, 1),
                "stage_ms": stage_ms,
                "probe_ms": round(stage_ms["translate+probe"]
                                  - stage_ms["translate"], 2),
                "agg_tail_ms": round(stage_ms["full"]
                                     - stage_ms["translate+probe"], 2),
            }
            eprint(f"pipeline at {gb:.1f} GB: {out['pipeline']}")
            break
    print(json.dumps(out))
    with open("/tmp/bigtable_r5.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
