"""Marginal cost of each fused-pipeline stage.

Times the full fused program, then variants with one stage replaced by a
cheap stand-in, at bench.py's exact shapes. The drop vs FULL is that
stage's marginal cost *inside* the fusion (standalone timings mislead:
XLA overlaps stages). Development tool, not a test.

Usage: python scripts/profile_marginal.py [iters]
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
from umgap_tpu.pipeline.fused import PipelineConfig
from umgap_tpu.taxonomy import Taxon, Taxonomy

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def build_world():
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
    dna = rng.integers(0, 4, size=(B, E, L)).astype(np.uint8)
    lengths = np.full((B, E), L, dtype=np.int32)
    return dtax, dtable, jnp.asarray(dna), jnp.asarray(lengths)


def make_variant(name, dtax, dtable, config):
    """Fused pipeline with one stage optionally stubbed out."""
    tbl = encoding.get_table(config.table_number)

    @jax.jit
    def step(dna, lengths, dtable, dtax):
        B, E, L = dna.shape
        if name == "no_translate":
            # stand-in: cheap cast instead of codon translation
            P = (L - 2) // 3 if False else (L - 2 - 0) // 3
            P = (L - 0) // 3
            aa = (dna[..., : P * 3: 3].reshape(B * E, 1, P)
                  .repeat(6, axis=1).astype(jnp.uint8))
            plens = jnp.broadcast_to(
                (lengths.reshape(B * E) // 3)[:, None], (B * E, 6))
        else:
            aa, plens = translate.translate6_batch(
                dna.reshape(B * E, L), lengths.reshape(B * E), tbl)
        hi, lo, wvalid = kmers.pack_windows_batch(aa, plens, config.k)
        if name == "no_probe":
            taxa = (hi ^ lo) & 1023
            found = wvalid
        else:
            taxa, found = lookup.probe(dtable, hi, lo, valid=wvalid,
                                       default=0)
        taxa = jnp.where(wvalid, taxa, 0)
        W = taxa.shape[-1]
        nkmers = jnp.maximum(plens - (config.k - 1), 0)
        if name == "no_seedextend":
            keep = wvalid
        else:
            keep = seedextend.seedextend_mask_batch(
                taxa, nkmers, config.min_seed_size, config.max_gap_size)
        hits = jnp.where(keep, taxa, 0)
        hits = hits.reshape(B, E * 6 * W)
        if name == "no_agg":
            return hits.sum(axis=-1).astype(jnp.int32)
        utaxa, ucounts, uvalid = devagg.dedup_counts(
            hits, jnp.ones_like(hits, jnp.float32), config.k_max)
        if name == "no_dedup_downstream":
            return (utaxa.sum(-1) + ucounts.sum(-1).astype(jnp.int32))
        uvalid = devagg.filter_lower_bound(ucounts, uvalid,
                                           config.lower_bound)
        agg = devagg.aggregate_batch(
            dtax, utaxa, ucounts, uvalid, config.method, config.strategy,
            config.factor)
        snapped = devagg.snap_batch(dtax.snap_valid, agg, default=0)
        nonempty = uvalid.any(axis=-1)
        return jnp.where(nonempty, snapped, 1).astype(jnp.int32)

    return lambda dna, lengths: step(dna, lengths, dtable, dtax)


def timeit(fn, *args):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    dtax, dtable, dna, lengths = build_world()
    config = PRESETS["high-sensitivity"]._replace(k_max=128)
    full = timeit(make_variant("full", dtax, dtable, config), dna, lengths)
    print(f"{'FULL':28s} {full * 1e3:8.2f} ms")
    for name in ("no_translate", "no_probe", "no_seedextend", "no_agg",
                 "no_dedup_downstream"):
        t = timeit(make_variant(name, dtax, dtable, config), dna, lengths)
        print(f"{name:28s} {t * 1e3:8.2f} ms   marginal "
              f"{(full - t) * 1e3:+7.2f} ms")
    B = dna.shape[0]
    print(f"FULL pairs/s: {B / full:,.0f}")


if __name__ == "__main__":
    main()
