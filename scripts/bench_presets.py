"""Device-resident throughput for EVERY fused preset (one-off, feeds
the PERF.md per-preset table; the driver bench stays one metric).

9-mer presets run over the shared .bench_data workload; the tryptic
presets use a peptide index of real tryptic fragments digested from a
subset of the workload reads plus random noise peptides.

Run on the real chip: python scripts/bench_presets.py
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

t00 = time.time()


def log(s):
    print(f"[{time.time()-t00:6.1f}s] {s}", flush=True)


def main():
    from umgap_tpu import ranks
    from umgap_tpu.agg import device as devagg
    from umgap_tpu.index.table import PeptideTable, build_kmer_table
    from umgap_tpu.ops import encoding as enc, kmers as kmerops, lookup
    from umgap_tpu.pipeline import PRESETS, TRYPTIC_PRESETS
    from umgap_tpu.pipeline.fused import pipeline_step
    from umgap_tpu.pipeline.tryptic import tryptic_pipeline_step
    from umgap_tpu.taxonomy import Taxon, Taxonomy

    DATA = os.path.join(REPO, ".bench_data")
    manifest = json.load(open(os.path.join(DATA, "manifest.json")))
    P, L, n_tax = (manifest["n_pairs"], manifest["read_len"],
                   manifest["n_tax"])
    parent = np.fromfile(os.path.join(DATA, "parent.bin"), np.int32)
    snap = np.fromfile(os.path.join(DATA, "snap.bin"), np.int32)
    taxa = [Taxon(i, f"t{i}", ranks.NO_RANK if i % 3 else 14,
                  int(parent[i]), bool(snap[i] == i))
            for i in range(1, n_tax + 1)]
    tax = Taxonomy(taxa)
    dtax = devagg.DeviceTaxonomy.from_host(tax)
    keys = np.fromfile(os.path.join(DATA, "index_keys.bin"), np.uint64)
    vals = np.fromfile(os.path.join(DATA, "index_vals.bin"), np.int32)
    table = build_kmer_table(keys, vals, k=9)
    dtable = lookup.DeviceTable.from_host(table)
    reads = np.fromfile(os.path.join(DATA, "reads.bin"),
                        np.uint8).reshape(P, 2, L)
    B = 16384
    dna = jax.device_put(reads[:B])
    dlen = jax.device_put(np.full((B, 2), L, np.int32))

    def timeit(jfn, *args, secs=4.0):
        np.asarray(jfn(*args))
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < secs:
            np.asarray(jfn(*args))
            n += 1
        return (time.perf_counter() - t0) / n

    results = {}
    for name, config in PRESETS.items():
        jfn = jax.jit(lambda d, l, t, x, c=config: pipeline_step(
            d, l, x, t, c).sum())
        log(f"compiling {name}...")
        dt = timeit(jfn, dna, dlen, dtable, dtax)
        results[name] = B / dt
        log(f"{name}: {B/dt:,.0f} pairs/s device-resident")

    # tryptic index: real fragments from 4096 pairs + noise peptides
    rng = np.random.default_rng(11)
    tt = enc.get_table(1)
    frags = set()
    for p in range(4096):
        for e in range(2):
            codes = reads[p, e]
            rc = (3 - codes[::-1]).astype(codes.dtype)
            for fc in (codes, codes[1:], codes[2:], rc, rc[1:], rc[2:]):
                pep = enc.decode_aa(tt.translate_frame(fc))
                for f in kmerops.tryptic_digest(pep):
                    if 9 <= len(f) <= 45:
                        frags.add(f)
    frags = sorted(frags)
    aas = "ACDEFGHIKLMNPQRSTVWY"
    noise = ["".join(rng.choice(list(aas), rng.integers(9, 46)))
             for _ in range(200_000)]
    peps = frags + noise
    pvals = rng.integers(1, n_tax + 1, len(peps)).astype(np.int32)
    log(f"tryptic index: {len(frags)} real + {len(noise)} noise peptides")
    ptable = PeptideTable.build(peps, pvals, store_keys=False)
    dptable = lookup.DeviceTable.from_host(ptable)

    for name, config in TRYPTIC_PRESETS.items():
        jfn = jax.jit(lambda d, l, t, x, c=config: tryptic_pipeline_step(
            d, l, x, t, c).sum())
        log(f"compiling {name}...")
        dt = timeit(jfn, dna, dlen, dptable, dtax)
        results[name] = B / dt
        log(f"{name}: {B/dt:,.0f} pairs/s device-resident")

    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
