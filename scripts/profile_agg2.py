"""Finer breakdown: aggregate sub-stages, probe gather floor, batch scaling.

Development tool, not a test.
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
from umgap_tpu.ops import lookup
from umgap_tpu.taxonomy import Taxon, Taxonomy

ITERS = 16


def timeit(fn, *args):
    jax.tree_util.tree_map(np.asarray, fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.default_rng(42)
    n_tax = 20_000
    taxa = [Taxon(1, "root", ranks.NO_RANK, 1, True)]
    for i in range(2, n_tax + 1):
        taxa.append(Taxon(i, f"t{i}", int(rng.integers(0, ranks.RANK_COUNT)),
                          int(rng.integers(1, i)), True))
    tax = Taxonomy(taxa)
    dtax = devagg.DeviceTaxonomy.from_host(tax)
    print("anc table depth D =", tax.anc_table.shape[1])

    B, K = 4096, 128
    utaxa = rng.integers(2, n_tax, size=(B, K)).astype(np.int32)
    uvalid = rng.random((B, K)) < 0.3
    ucounts = rng.integers(1, 5, size=(B, K)).astype(np.float32)
    utaxa_j = jnp.asarray(utaxa)
    uvalid_j = jnp.asarray(uvalid)
    ucounts_j = jnp.asarray(ucounts)

    @jax.jit
    def geom_only(dtax, utaxa, uvalid):
        g = devagg.hit_geometry(dtax, utaxa, uvalid)
        return g.is_anc.sum(), g.depth.sum()

    @jax.jit
    def full_mix(dtax, utaxa, ucounts, uvalid):
        g = devagg.hit_geometry(dtax, utaxa, uvalid)
        return devagg.tree_mix_batch(dtax, g, utaxa, ucounts, 0.25)

    @jax.jit
    def full_lca(dtax, utaxa, ucounts, uvalid):
        g = devagg.hit_geometry(dtax, utaxa, uvalid)
        return devagg.tree_lca_batch(dtax, g, utaxa)

    t = timeit(geom_only, dtax, utaxa_j, uvalid_j)
    print(f"hit_geometry only       {t*1e3:8.2f} ms")
    t = timeit(full_mix, dtax, utaxa_j, ucounts_j, uvalid_j)
    print(f"geometry + tree_mix     {t*1e3:8.2f} ms")
    t = timeit(full_lca, dtax, utaxa_j, ucounts_j, uvalid_j)
    print(f"geometry + tree_lca     {t*1e3:8.2f} ms")

    # ---- probe floor: raw gathers at bench scale ---------------------- #
    n_keys = 2_000_000
    packed = np.unique(rng.integers(0, 2 ** 45, size=int(1.2 * n_keys),
                                    dtype=np.uint64))[:n_keys]
    values = rng.integers(2, n_tax, size=n_keys).astype(np.int32)
    table = build_kmer_table(packed, values, k=9)
    dtable = lookup.DeviceTable.from_host(table)
    print("table kind", dtable.kind, "rows", dtable.rows.shape)

    NQ = 4096 * 2 * 6 * 26  # ~bench query count
    q = rng.integers(0, dtable.rows.shape[0], size=NQ).astype(np.int32)
    q_j = jnp.asarray(q.reshape(4096, -1))
    hi = jnp.asarray(rng.integers(0, 2 ** 20, size=(4096, NQ // 4096)).astype(np.int32))
    lo = jnp.asarray(rng.integers(0, 2 ** 25, size=(4096, NQ // 4096)).astype(np.int32))

    @jax.jit
    def raw_take1(rows, q):
        r = jnp.take(rows, q, axis=0)
        return r.sum(axis=-1).astype(jnp.int32)

    @jax.jit
    def raw_take2(rows, q):
        r0 = jnp.take(rows, q, axis=0)
        r1 = jnp.take(rows, (q + 7) % rows.shape[0], axis=0)
        return (r0.sum(-1) + r1.sum(-1)).astype(jnp.int32)

    @jax.jit
    def probe_now(dtable, hi, lo):
        v, f = lookup.probe(dtable, hi, lo)
        return v

    t = timeit(raw_take1, dtable.rows, q_j)
    print(f"1x take rows({NQ})      {t*1e3:8.2f} ms")
    t = timeit(raw_take2, dtable.rows, q_j)
    print(f"2x take rows({NQ})      {t*1e3:8.2f} ms")
    t = timeit(probe_now, dtable, hi, lo)
    print(f"full probe({NQ})        {t*1e3:8.2f} ms")

    # int64 single-lane gather comparison
    rows64 = jnp.asarray(
        np.ascontiguousarray(
            np.asarray(dtable.rows).astype(np.int32).view(np.int64).reshape(-1)))

    @jax.jit
    def take64(rows, q):
        r = jnp.take(rows, q, axis=0)
        return (r & 0xffff).astype(jnp.int32)

    t = timeit(take64, rows64, q_j)
    print(f"1x take int64({NQ})     {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
