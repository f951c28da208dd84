"""Relative collective/routing overhead of the sharded pipeline vs
shard count (VERDICT r3 weak #5: give the 4-host 80% projection a shape
datapoint).

Strong-scaling form on the virtual CPU mesh: TOTAL batch fixed, shard
count n in {1, 2, 4, 8}.  The 8 virtual devices share 2 physical cores,
so ABSOLUTE times are meaningless and weak scaling would only measure
core contention; what the curve shows is the GROWTH of the
routing+collective work (per-device owner sort/scatter, all_to_all both
ways, psum) as shards multiply at constant compute — t(n)/t(1) - 1 is
an upper bound on the collective fraction at shard count n (upper bound
because virtual-device context switching also grows with n).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/exp_collective_curve.py [total_batch=4096]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from umgap_tpu.agg import device as devagg
    from umgap_tpu.parallel import (
        ShardedTable,
        build_sharded_tables,
        make_mesh,
        make_sharded_pipeline,
    )
    from umgap_tpu.pipeline import PRESETS
    from umgap_tpu.taxonomy import Taxonomy, fixture_taxa

    total_b = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(0)
    tax = Taxonomy(fixture_taxa())
    dtax = devagg.DeviceTaxonomy.from_host(tax)
    packed = np.unique(
        rng.integers(0, 2 ** 45, size=2_000_000).astype(np.uint64))
    ids = np.array([2, 10239, 12884, 185751, 185752], np.int32)
    values = rng.choice(ids, size=len(packed)).astype(np.int32)
    config = PRESETS["max-sensitivity"]._replace(k_max=32)

    E, L = 2, 100
    dna = rng.integers(0, 4, size=(total_b, E, L)).astype(np.uint8)
    lens = np.full((total_b, E), L, np.int32)

    out = {"total_batch": total_b, "keys": int(len(packed)), "curve": {}}
    t1 = None
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        shards = build_sharded_tables(packed, values, k=9, n_shards=n)
        stable = ShardedTable.from_shards(shards, mesh)
        step = make_sharded_pipeline(dtax, stable, config, mesh)
        taxa, freq = step(dna, lens)  # compile + warm
        np.asarray(taxa)
        reps = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < 6.0:
            taxa, freq = step(dna, lens)
            np.asarray(taxa)
            reps += 1
        dt = (time.perf_counter() - t0) / reps
        if t1 is None:
            t1 = dt
        out["curve"][n] = {
            "step_ms": round(dt * 1e3, 2),
            "rel_vs_1shard": round(dt / t1, 3),
            "overhead_upper_bound": round(dt / t1 - 1, 3),
        }
        print(f"n={n}: {dt * 1e3:.1f} ms/step  rel={dt / t1:.3f}",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
