"""Benchmark: fused 9-mer pipeline throughput on one TPU chip.

Measures read-pairs/second of the high-sensitivity preset
(translate -a | prot2kmer2lca -o | seedextend -g1 -s3 | uniq |
taxa2agg hybrid f=0.25) as one fused jitted program, over the shared
workload produced by scripts/gen_bench_workload.py: 32768 100bp read
pairs with realistic index hit rates (coding-frame k-mers planted in a
2M-key index) and a 20k-node taxonomy.

The denominator is MEASURED, not modeled: native/baseline_cpu.cpp is a
multithreaded -O3 C++ implementation of the same pipeline over the same
workload files, with the FST lookup replaced by a (strictly faster)
open-addressing hash probe — an upper bound on the Rust reference's
throughput on this host, making vs_baseline conservative. The measured
number is committed in native/baseline_measured.json (re-measure with
`./native/baseline_cpu .bench_data`).

Reported: end-to-end pairs/s (host wire -> device -> result on host,
depth-2 dispatch as in the production runner) as the headline `value`,
plus device-resident throughput and a per-stage breakdown in `extra`.
Outputs are materialized on the host each step: the axon platform's
block_until_ready does not actually block, so small on-device checksums
transferred back are the honest completion barrier for stage timings.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(REPO, ".bench_data")

BATCH = 32768  # amortizes the ~27 ms serialized dispatch floor (PERF.md)


def ensure_workload():
    if not os.path.exists(os.path.join(DATA, "manifest.json")):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "scripts", "gen_bench_workload.py")],
                       check=True)
    with open(os.path.join(DATA, "manifest.json")) as f:
        return json.load(f)


def load(name, dtype):
    return np.fromfile(os.path.join(DATA, name), dtype=dtype)


def baseline_pairs_per_s() -> tuple[float, str]:
    path = os.path.join(REPO, "native", "baseline_measured.json")
    if os.path.exists(path):
        with open(path) as f:
            d = json.load(f)
        return float(d["pairs_per_s"]), d.get("note", "measured C++ baseline")
    return 25_000.0, "modeled (no measured baseline file)"


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".jax_cache"))
    manifest = ensure_workload()
    import jax
    import jax.numpy as jnp

    from umgap_tpu import ranks
    from umgap_tpu.agg import device as devagg
    from umgap_tpu.index.table import build_kmer_table
    from umgap_tpu.ops import encoding as enc
    from umgap_tpu.ops import kmers as kmerops
    from umgap_tpu.ops import lookup, seedextend, translate
    from umgap_tpu.pipeline import PRESETS
    from umgap_tpu.pipeline.fused import pipeline_step
    from umgap_tpu.taxonomy import Taxon, Taxonomy

    P = manifest["n_pairs"]
    L = manifest["read_len"]
    n_tax = manifest["n_tax"]

    # --- taxonomy ----------------------------------------------------- #
    parent = load("parent.bin", np.int32)
    snap = load("snap.bin", np.int32)
    taxa = []
    for i in range(1, n_tax + 1):
        valid = snap[i] == i
        taxa.append(Taxon(i, f"t{i}", ranks.NO_RANK if i % 3 else 14,
                          int(parent[i]), bool(valid)))
    tax = Taxonomy(taxa)
    dtax = devagg.DeviceTaxonomy.from_host(tax)

    # --- index -------------------------------------------------------- #
    keys = load("index_keys.bin", np.uint64)
    vals = load("index_vals.bin", np.int32)
    t0 = time.perf_counter()
    table = build_kmer_table(keys, vals, k=9)
    build_s = time.perf_counter() - t0
    dtable = lookup.DeviceTable.from_host(table)

    # --- reads -------------------------------------------------------- #
    reads = load("reads.bin", np.uint8).reshape(P, 2, L)
    n_batches = P // BATCH
    lengths_np = np.full((BATCH, 2), L, dtype=np.int32)
    batches_p4 = [enc.pack_dna4(reads[i * BATCH:(i + 1) * BATCH])
                  for i in range(n_batches)]

    # The production k_max (64): reads with more distinct hit taxa are
    # detected on device and re-routed through a wide program by the
    # runner; the workload's overflow count is measured and reported
    # below so the headline number is honest about that fallback.
    config = PRESETS["high-sensitivity"]
    tt = enc.get_table(config.table_number)

    # --- device-resident inputs for stage timings --------------------- #
    ddna = [jax.device_put(reads[i * BATCH:(i + 1) * BATCH].astype(np.uint8))
            for i in range(n_batches)]
    dlen = jax.device_put(lengths_np)

    def stage_translate(dna, lengths, dtable, dtax):
        B, E, l = dna.shape
        aa, plens = translate.translate6_batch(
            dna.reshape(B * E, l), lengths.reshape(B * E), tt)
        return aa.astype(jnp.int32).sum() + plens.sum()

    def stage_probe(dna, lengths, dtable, dtax):
        B, E, l = dna.shape
        aa, plens = translate.translate6_batch(
            dna.reshape(B * E, l), lengths.reshape(B * E), tt)
        hi, lo, wvalid = kmerops.pack_windows_batch(aa, plens, config.k)
        taxa_, found = lookup.probe(dtable, hi, lo, valid=wvalid, default=0)
        return taxa_.sum() + found.sum()

    def stage_seed(dna, lengths, dtable, dtax):
        B, E, l = dna.shape
        aa, plens = translate.translate6_batch(
            dna.reshape(B * E, l), lengths.reshape(B * E), tt)
        hi, lo, wvalid = kmerops.pack_windows_batch(aa, plens, config.k)
        taxa_, _ = lookup.probe(dtable, hi, lo, valid=wvalid, default=0)
        taxa_ = jnp.where(wvalid, taxa_, 0)
        nk = jnp.maximum(plens - (config.k - 1), 0)
        keep = seedextend.seedextend_mask_batch(
            taxa_, nk, config.min_seed_size, config.max_gap_size)
        return jnp.where(keep, taxa_, 0).sum()

    def stage_full(dna, lengths, dtable, dtax):
        return pipeline_step(dna, lengths, dtax, dtable, config).sum()

    # k_max overflow rate over the whole workload (fallback honesty)
    @jax.jit
    def count_overflow(dna, lengths, dtable, dtax):
        _, ov = pipeline_step(dna, lengths, dtax, dtable, config,
                              with_overflow=True)
        return ov.sum()

    n_overflow = sum(
        int(np.asarray(count_overflow(d, dlen, dtable, dtax)))
        for d in ddna)

    stages = {"translate": stage_translate, "probe": stage_probe,
              "seedextend": stage_seed, "full": stage_full}
    stage_times = {}
    for name, fn in stages.items():
        jfn = jax.jit(fn)
        np.asarray(jfn(ddna[0], dlen, dtable, dtax))  # compile+warm
        t0 = time.perf_counter()
        reps = 0
        acc = 0
        while time.perf_counter() - t0 < 6.0:
            acc += int(np.asarray(jfn(ddna[reps % n_batches], dlen,
                                      dtable, dtax)))
            reps += 1
        stage_times[name] = (time.perf_counter() - t0) / reps
    device_pairs_per_s = BATCH / stage_times["full"]

    # --- end-to-end over the 4-bit wire with depth-2 dispatch ---------- #
    @jax.jit
    def step_wire(dna4, lengths, dtable, dtax):
        dna = enc.unpack_dna4_device(dna4, L)
        return pipeline_step(dna, lengths, dtax, dtable, config)

    np.asarray(step_wire(batches_p4[0], lengths_np, dtable, dtax))
    t0 = time.perf_counter()
    inflight = []
    done_pairs = 0
    reps = 0
    while time.perf_counter() - t0 < 6.0 or reps < 2 * n_batches:
        inflight.append(step_wire(batches_p4[reps % n_batches], lengths_np,
                                  dtable, dtax))
        if len(inflight) > 2:
            np.asarray(inflight.pop(0))
            done_pairs += BATCH
        reps += 1
        if reps > 400:
            break
    for x in inflight:
        np.asarray(x)
        done_pairs += BATCH
    e2e_pairs_per_s = done_pairs / (time.perf_counter() - t0)

    base, base_note = baseline_pairs_per_s()
    result = {
        "metric": "high_sensitivity_pairs_per_s",
        "value": round(e2e_pairs_per_s, 1),
        "unit": "read pairs/s",
        "vs_baseline": round(e2e_pairs_per_s / base, 3),
        "extra": {
            "device_resident_pairs_per_s": round(device_pairs_per_s, 1),
            "device_resident_vs_baseline": round(device_pairs_per_s / base, 3),
            f"stage_ms_per_{BATCH}_pairs": {
                k: round(v * 1e3, 3) for k, v in stage_times.items()},
            "k_max": config.k_max,
            "k_max_overflow_reads": n_overflow,
            "table_layout": f"bucket{dtable.bucket}"
                            f"(stash={int(dtable.stash.shape[0])})",
            "baseline_pairs_per_s": base,
            "baseline_note": base_note,
            "table_build_s": round(build_s, 1),
            "n_keys": manifest["n_keys"],
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
