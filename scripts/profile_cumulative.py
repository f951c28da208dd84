"""Cumulative-prefix timing of the fused pipeline (transfer-free).

Builds jitted programs that run the pipeline up to stage k and return a
scalar checksum, so device->host transfer is negligible and XLA fusion
across stages is preserved. The difference between consecutive prefixes
is the marginal cost of each stage inside the fused program.

Usage: python scripts/profile_cumulative.py [iters]
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
from umgap_tpu.pipeline import PRESETS
from umgap_tpu.taxonomy import Taxon, Taxonomy


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(42)

    n_tax = 20_000
    taxa = [Taxon(1, "root", ranks.NO_RANK, 1, True)]
    for i in range(2, n_tax + 1):
        taxa.append(Taxon(i, f"t{i}", int(rng.integers(0, ranks.RANK_COUNT)),
                          int(rng.integers(1, i)), True))
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
    k = config.k

    def upto(stage):
        def fn(dna, lengths, dtable, dtax):
            aa, plens = translate.translate6_batch(
                dna.reshape(B * E, L), lengths.reshape(B * E), ctable)
            if stage == 1:
                return jnp.sum(aa.astype(jnp.int32)) + jnp.sum(plens)
            hi, lo, wvalid = kmers.pack_windows_batch(aa, plens, k)
            if stage == 2:
                return jnp.sum(hi) + jnp.sum(lo) + jnp.sum(wvalid)
            taxa, found = lookup.probe(dtable, hi, lo, valid=wvalid, default=0)
            taxa = jnp.where(wvalid, taxa, 0)
            if stage == 3:
                return jnp.sum(taxa) + jnp.sum(found)
            nkmers = jnp.maximum(plens - (k - 1), 0)
            keep = seedextend.seedextend_mask_batch(
                taxa, nkmers, config.min_seed_size, config.max_gap_size)
            hits = jnp.where(keep, taxa, 0)
            if stage == 4:
                return jnp.sum(hits)
            W = taxa.shape[-1]
            hits = hits.reshape(B, 2 * 6 * W)
            utaxa, ucounts, uvalid = devagg.dedup_counts(
                hits, jnp.ones_like(hits, jnp.float32), config.k_max)
            if stage == 5:
                return jnp.sum(utaxa) + jnp.sum(ucounts) + jnp.sum(uvalid)
            uvalid2 = devagg.filter_lower_bound(ucounts, uvalid,
                                                config.lower_bound)
            agg = devagg.aggregate_batch(
                dtax, utaxa, ucounts, uvalid2, config.method, config.strategy,
                config.factor)
            snapped = devagg.snap_batch(dtax.snap_valid, agg, default=0)
            out = jnp.where(uvalid2.any(axis=-1), snapped, 1)
            return jnp.sum(out)

        return jax.jit(fn)

    names = ["translate", "+pack", "+probe", "+seedextend", "+dedup", "+agg"]
    prev = 0.0
    for stage, name in enumerate(names, start=1):
        fn = upto(stage)
        r = fn(dna, lengths, dtable, dtax)
        np.asarray(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(dna, lengths, dtable, dtax)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:14s} cum {dt * 1e3:8.2f} ms   marginal "
              f"{(dt - prev) * 1e3:8.2f} ms")
        prev = dt


if __name__ == "__main__":
    main()
