"""Micro-profile of the aggregation stage (dedup/geometry/mix) on device."""

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
from umgap_tpu.taxonomy import Taxon, Taxonomy


def bench(name, fn, *args, iters=16):
    r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.2f} ms")
    return r


def main():
    rng = np.random.default_rng(42)
    n_tax = 20_000
    taxa = [Taxon(1, "root", ranks.NO_RANK, 1, True)]
    for i in range(2, n_tax + 1):
        taxa.append(Taxon(i, f"t{i}", int(rng.integers(0, ranks.RANK_COUNT)),
                          int(rng.integers(1, i)), True))
    tax = Taxonomy(taxa)
    dtax = devagg.DeviceTaxonomy.from_host(tax)
    print("anc table D =", tax.anc_table.shape[1])

    B, N, K = 4096, 300, 128
    hits = rng.integers(0, n_tax, size=(B, N)).astype(np.int32)
    hits[rng.random((B, N)) < 0.9] = 0  # ~30 nonzero hits per read
    hits = jnp.asarray(hits)
    w = jnp.ones((B, N), jnp.float32)

    @jax.jit
    def f_dedup(hits, w):
        return devagg.dedup_counts(hits, w, K)

    utaxa, ucounts, uvalid = bench("dedup_counts", f_dedup, hits, w)
    utaxa, ucounts, uvalid = (jax.device_put(np.asarray(x))
                              for x in (utaxa, ucounts, uvalid))

    @jax.jit
    def f_geom(dtax, utaxa, uvalid):
        g = devagg.hit_geometry(dtax, utaxa, uvalid)
        return g.lin.sum() + g.depth.sum() + g.is_anc.sum()

    bench("hit_geometry", f_geom, dtax, utaxa, uvalid)

    @jax.jit
    def f_lin_only(dtax, utaxa, uvalid):
        size = dtax.depth.shape[0]
        safe = jnp.where(uvalid, jnp.clip(utaxa, 0, size - 1), 0)
        return dtax.anc[safe].sum()

    bench("  lin gather only", f_lin_only, dtax, utaxa, uvalid)

    @jax.jit
    def f_mix(dtax, utaxa, ucounts, uvalid):
        geom = devagg.hit_geometry(dtax, utaxa, uvalid)
        return devagg.tree_mix_batch(dtax, geom, utaxa, ucounts, 0.25)

    bench("geom+tree_mix", f_mix, dtax, utaxa, ucounts, uvalid)

    @jax.jit
    def f_lca(dtax, utaxa, ucounts, uvalid):
        geom = devagg.hit_geometry(dtax, utaxa, uvalid)
        return devagg.tree_lca_batch(dtax, geom, utaxa)

    bench("geom+tree_lca", f_lca, dtax, utaxa, ucounts, uvalid)

    @jax.jit
    def f_rtl(dtax, utaxa, ucounts, uvalid):
        geom = devagg.hit_geometry(dtax, utaxa, uvalid)
        return devagg.rtl_batch(dtax, geom, utaxa, ucounts)

    bench("geom+rtl", f_rtl, dtax, utaxa, ucounts, uvalid)


if __name__ == "__main__":
    main()
