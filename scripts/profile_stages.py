"""Per-stage timing of the fused 9-mer pipeline on the current device.

Times each pipeline stage in isolation (jitted, device-materialized) with
bench.py's exact shapes, to locate the throughput bottleneck. Not a test;
a development tool.

Usage: python scripts/profile_stages.py [iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp

from umgap_tpu import ranks
from umgap_tpu.agg import device as devagg
from umgap_tpu.index.table import build_kmer_table
from umgap_tpu.ops import encoding, kmers, lookup, seedextend, translate
from umgap_tpu.pipeline import PRESETS, make_pipeline
from umgap_tpu.taxonomy import Taxon, Taxonomy


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)  # warmup + materialize
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt * 1e3:9.2f} ms")
    return out, dt


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(42)

    n_tax = 20_000
    taxa = [Taxon(1, "root", ranks.NO_RANK, 1, True)]
    for i in range(2, n_tax + 1):
        parent = int(rng.integers(1, i))
        rank = int(rng.integers(0, ranks.RANK_COUNT))
        taxa.append(Taxon(i, f"t{i}", rank, parent, True))
    tax = Taxonomy(taxa)
    dtax = devagg.DeviceTaxonomy.from_host(tax)

    n_keys = 2_000_000
    packed = np.unique(rng.integers(0, 2 ** 45, size=int(1.2 * n_keys),
                                    dtype=np.uint64))[:n_keys]
    values = rng.integers(2, n_tax, size=n_keys).astype(np.int32)
    table = build_kmer_table(packed, values, k=9)
    dtable = lookup.DeviceTable.from_host(table)

    B, E, L = 4096, 2, 100
    dna = jnp.asarray(rng.integers(0, 4, size=(B, E, L)).astype(np.uint8))
    lengths = jnp.asarray(np.full((B, E), L, dtype=np.int32))
    config = PRESETS["high-sensitivity"]._replace(k_max=128)
    ctable = encoding.get_table(config.table_number)

    # stage 1: translate
    @jax.jit
    def s_translate(dna, lengths):
        return translate.translate6_batch(
            dna.reshape(B * E, L), lengths.reshape(B * E), ctable)

    (aa, plens), t1 = timeit("translate6", s_translate, dna, lengths,
                             iters=iters)
    aa = jax.device_put(np.asarray(aa))
    plens = jax.device_put(np.asarray(plens))

    # stage 2: kmer pack
    @jax.jit
    def s_pack(aa, plens):
        return kmers.pack_windows_batch(aa, plens, config.k)

    (hi, lo, wvalid), t2 = timeit("pack_windows", s_pack, aa, plens,
                                  iters=iters)
    hi, lo, wvalid = (jax.device_put(np.asarray(x)) for x in (hi, lo, wvalid))

    # stage 3: probe
    @jax.jit
    def s_probe(dtable, hi, lo, wvalid):
        t, f = lookup.probe(dtable, hi, lo, valid=wvalid, default=0)
        return jnp.where(wvalid, t, 0)

    taxa_arr, t3 = timeit("probe", s_probe, dtable, hi, lo, wvalid,
                          iters=iters)
    taxa_arr = jax.device_put(np.asarray(taxa_arr))

    # stage 4: seedextend
    nkmers = jnp.maximum(plens - (config.k - 1), 0)

    @jax.jit
    def s_seed(taxa_arr, nkmers):
        keep = seedextend.seedextend_mask_batch(
            taxa_arr, nkmers, config.min_seed_size, config.max_gap_size)
        return jnp.where(keep, taxa_arr, 0)

    hits, t4 = timeit("seedextend", s_seed, taxa_arr, nkmers, iters=iters)
    W = np.asarray(hits).shape[-1]
    hits = jax.device_put(np.asarray(hits).reshape(B, E * 6 * W))

    # stage 5: aggregate (dedup + filter + aggregate + snap)
    @jax.jit
    def s_agg(dtax, hits):
        utaxa, ucounts, uvalid = devagg.dedup_counts(
            hits, jnp.ones_like(hits, jnp.float32), config.k_max)
        uvalid = devagg.filter_lower_bound(ucounts, uvalid,
                                           config.lower_bound)
        agg = devagg.aggregate_batch(
            dtax, utaxa, ucounts, uvalid, config.method, config.strategy,
            config.factor)
        snapped = devagg.snap_batch(dtax.snap_valid, agg, default=0)
        return jnp.where(uvalid.any(axis=-1), snapped, 1).astype(jnp.int32)

    _, t5 = timeit("aggregate", s_agg, dtax, hits, iters=iters)

    # full fused pipeline
    step = make_pipeline(dtax, dtable, config)
    _, t6 = timeit("FULL pipeline", step, dna, lengths, iters=iters)

    total = t1 + t2 + t3 + t4 + t5
    print(f"{'sum of stages':28s} {total * 1e3:9.2f} ms")
    print(f"fused pairs/s: {B / t6:,.0f}")


if __name__ == "__main__":
    main()
