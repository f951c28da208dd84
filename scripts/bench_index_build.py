"""At-scale index build benchmark: joinkmers + table build at N keys.

Generates a synthetic sorted (kmer, taxid) corpus with realistic group
structure (70% singleton groups, duplicated hot taxa, some wide groups),
runs the vectorized scale join (umgap_tpu/index/scale.py) and the packed
table build, and prints one JSON line with timings.

Usage: python scripts/bench_index_build.py [n_keys]  (default 100e6)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from umgap_tpu import ranks  # noqa: E402
from umgap_tpu.index.scale import join_kmers_sorted  # noqa: E402
from umgap_tpu.index.table import build_kmer_table  # noqa: E402
from umgap_tpu.taxonomy import Taxon, Taxonomy  # noqa: E402


def main():
    n_keys = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000_000
    rng = np.random.default_rng(7)

    # taxonomy: 2M nodes (NCBI-scale)
    n_tax = 2_000_000
    t0 = time.perf_counter()
    parent = np.ones(n_tax + 1, dtype=np.int64)
    parent[2:] = (rng.random(n_tax - 1) * (np.arange(2, n_tax + 1) - 1)).astype(
        np.int64) + 1
    taxa = [Taxon(1, "root", ranks.NO_RANK, 1, True)]
    rk = rng.integers(0, ranks.RANK_COUNT, size=n_tax + 1)
    vd = rng.random(n_tax + 1) > 0.1
    taxa.extend(
        Taxon(i, "", int(rk[i]), int(parent[i]), bool(vd[i]))
        for i in range(2, n_tax + 1)
    )
    tax = Taxonomy(taxa)
    t_tax = time.perf_counter() - t0

    # corpus: n_keys distinct keys; 70% singleton groups, the rest with
    # 2..8 extra rows drawn from a hot-taxon pool (real k-mer groups
    # repeat the same few taxa).
    t0 = time.perf_counter()
    keys = np.unique(rng.integers(0, 2 ** 45, size=int(1.05 * n_keys),
                                  dtype=np.uint64))[:n_keys]
    extra_mask = rng.random(n_keys) < 0.3
    extra_counts = rng.integers(1, 8, size=int(extra_mask.sum()))
    n_extra = int(extra_counts.sum())
    packed = np.concatenate([
        keys,
        np.repeat(keys[extra_mask], extra_counts),
    ])
    order = np.argsort(packed, kind="stable")
    packed = packed[order]
    tids = rng.integers(1, n_tax + 1, size=len(packed)).astype(np.int64)
    hot = rng.random(len(packed)) < 0.5
    tids[hot] = rng.integers(1, 2000, size=int(hot.sum()))
    t_gen = time.perf_counter() - t0

    t0 = time.perf_counter()
    out_keys, out_vals = join_kmers_sorted(packed, tids, tax, group_cap=64)
    t_join = time.perf_counter() - t0

    t0 = time.perf_counter()
    table = build_kmer_table(out_keys, out_vals, k=9)
    t_table = time.perf_counter() - t0

    print(json.dumps({
        "n_keys": n_keys,
        "n_rows": len(packed),
        "n_out": int(len(out_keys)),
        "taxonomy_s": round(t_tax, 1),
        "gen_s": round(t_gen, 1),
        "join_s": round(t_join, 1),
        "table_build_s": round(t_table, 1),
        "rows_per_s_join": round(len(packed) / t_join),
        "keys_per_s_table": round(len(out_keys) / t_table),
    }))


if __name__ == "__main__":
    main()
