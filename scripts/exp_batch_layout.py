"""One-off: e2e wire throughput at BATCH=32768 (floor amortization) and
with the bucket4s layout (32 B rows, ~4x memory) at BATCH=16384.

Run on the real chip: python scripts/exp_batch_layout.py
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

from umgap_tpu.index.table import build_kmer_table
from umgap_tpu.ops import encoding as enc, lookup
from umgap_tpu.pipeline import PRESETS
from umgap_tpu.pipeline.fused import pipeline_step

t00 = time.time()


def log(s):
    print(f"[{time.time()-t00:6.1f}s] {s}", flush=True)


def e2e(step_wire, batches_p4, lengths_np, dtable, dtax, L, batch, secs=6.0):
    np.asarray(step_wire(batches_p4[0], lengths_np, dtable, dtax))
    n_b = len(batches_p4)
    t0 = time.perf_counter()
    inflight, done, reps = [], 0, 0
    while time.perf_counter() - t0 < secs or reps < 2 * n_b:
        inflight.append(step_wire(batches_p4[reps % n_b], lengths_np,
                                  dtable, dtax))
        if len(inflight) > 2:
            np.asarray(inflight.pop(0))
            done += batch
        reps += 1
        if reps > 400:
            break
    for x in inflight:
        np.asarray(x)
        done += batch
    return done / (time.perf_counter() - t0)


def main():
    DATA = os.path.join(REPO, ".bench_data")
    manifest = json.load(open(os.path.join(DATA, "manifest.json")))
    P, L, n_tax = (manifest["n_pairs"], manifest["read_len"],
                   manifest["n_tax"])
    from umgap_tpu import ranks
    from umgap_tpu.agg import device as devagg
    from umgap_tpu.taxonomy import Taxon, Taxonomy

    parent = np.fromfile(os.path.join(DATA, "parent.bin"), np.int32)
    snap = np.fromfile(os.path.join(DATA, "snap.bin"), np.int32)
    taxa = [Taxon(i, f"t{i}", ranks.NO_RANK if i % 3 else 14,
                  int(parent[i]), bool(snap[i] == i))
            for i in range(1, n_tax + 1)]
    dtax = devagg.DeviceTaxonomy.from_host(Taxonomy(taxa))
    keys = np.fromfile(os.path.join(DATA, "index_keys.bin"), np.uint64)
    vals = np.fromfile(os.path.join(DATA, "index_vals.bin"), np.int32)
    reads = np.fromfile(os.path.join(DATA, "reads.bin"),
                        np.uint8).reshape(P, 2, L)
    config = PRESETS["high-sensitivity"]

    @jax.jit
    def step_wire(dna4, lengths, dtable, dtax):
        dna = enc.unpack_dna4_device(dna4, L)
        return pipeline_step(dna, lengths, dtax, dtable, config)

    for layout, batch in (("bucket8s", 32768), ("bucket4s", 16384)):
        t0 = time.time()
        table = build_kmer_table(keys, vals, k=9, layout=layout)
        log(f"{layout} built in {time.time()-t0:.1f}s: bucket={table.bucket} "
            f"slots={table.capacity} stash={len(table.stash_hi)} "
            f"mem={table.rem.nbytes + table.values.nbytes >> 20}MB")
        dtable = lookup.DeviceTable.from_host(table)
        n_b = P // batch
        lengths_np = np.full((batch, 2), L, np.int32)
        b4 = [enc.pack_dna4(reads[i * batch:(i + 1) * batch])
              for i in range(n_b)]
        log(f"compiling wire step (B={batch}, {layout})...")
        rate = e2e(step_wire, b4, lengths_np, dtable, dtax, L, batch)
        log(f"{layout} B={batch}: {rate:,.0f} pairs/s e2e")


if __name__ == "__main__":
    main()
