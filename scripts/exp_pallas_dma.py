"""Round-5 experiment: DMA-pipelined Pallas row gather vs XLA's gather.

VERDICT r4 item 1: at >= 4.3 GB resident, XLA's row gather realizes
~54.9 M x 512 B rows/s ~= 28 GB/s — 3.4 % of the v5e's 819 GB/s HBM.
This kernel keeps K row-DMAs in flight (HBM -> VMEM async copies at
per-query dynamic bucket indices) to measure whether explicit DMA
pipelining can beat the XLA emitter's issue rate, or to pin the
per-row floor if it cannot.

The probed layout is bucket64s: one (1, 128)-int32 row (512 B, a full
(8,128) tile... actually (1,128) sublane) per query — the at-scale
serving geometry (umgap_tpu/index/table.py, PERF.md round 4).
Reference anchor: the per-kmer fst.get hot loop,
/root/reference/src/commands/prot2kmer2lca.rs:174-179.

Usage:
  python scripts/exp_pallas_dma.py selftest          # CPU interpret mode
  python scripts/exp_pallas_dma.py chip [sizes...]   # real-chip measure
"""

import functools
import json
import sys
import time

import numpy as np

WIDTH = 128  # int32 lanes per row (512 B — the bucket64s row)


def make_kernel(T: int, K: int, R: int, interpret: bool,
                idx_space: str = "smem"):
    """Build the (Q,)->(Q,) row-checksum gather via per-row DMAs.

    T: queries per grid step (multiple of 1024 for the (8,128) VMEM
    tiling of the per-tile output); K: DMAs in flight; R: rows per DMA
    (R>1 fetches R consecutive rows per query — for the issue-cost
    curve, not a real probe). ``idx_space``: where the per-tile index
    block lives — 'smem' reads addressing scalars natively, 'vmem' is
    the fallback if the backend rejects SMEM input blocks."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert T % 1024 == 0
    assert K & (K - 1) == 0 and T % (4 * K) == 0
    TS = T // 128  # sublane count of the (TS, 128) idx/out tiles

    def kernel(idx_ref, table_ref, out_ref, scratch, sems):
        def get_dma(j):
            b = idx_ref[0, j >> 7, j & 127]
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(b, R), :],
                scratch.at[pl.ds(j * R, R), :],
                sems.at[j & (K - 1)],
            )

        for j in range(K):  # warmup: K copies in flight
            get_dma(j).start()

        def body(i, carry):
            j0 = i * 4
            for u in range(4):  # unrolled: amortize loop overhead
                j = j0 + u
                get_dma(j).wait()
                @pl.when(j + K < T)
                def _():
                    get_dma(j + K).start()
            return carry

        jax.lax.fori_loop(0, T // 4, body, 0)
        out_ref[0] = jnp.sum(
            scratch[:].reshape(T, R * WIDTH), axis=1,
            dtype=jnp.int32).reshape(TS, 128)

    def gather(table, idx3):
        n_tiles = idx3.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (1, TS, 128), lambda i: (i, 0, 0),
                    memory_space=(pltpu.SMEM if idx_space == "smem"
                                  else pltpu.VMEM)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, TS, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, TS, 128), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((T * R, WIDTH), jnp.int32),
                pltpu.SemaphoreType.DMA((K,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(idx3, table)

    return gather


def run_case(nb: int, q: int, T: int, K: int, R: int, interpret: bool,
             table=None, reps: int = 3, idx_space: str = "smem",
             host_table=None):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    if table is None:
        table = jnp.asarray(
            rng.integers(0, 1 << 30, size=(nb, WIDTH), dtype=np.int32))
    idx = rng.integers(0, nb - R, size=q, dtype=np.int32)
    idx2 = jnp.asarray(idx.reshape(q // T, T // 128, 128))

    gather = make_kernel(T, K, R, interpret, idx_space=idx_space)

    @jax.jit
    def run(table, idx2):
        return gather(table, idx2).sum()

    # correctness (always): row checksums must match numpy.  The caller
    # passes its host copy of a big table — re-pulling GBs device->host
    # per configuration would dominate the sweep
    if host_table is None:
        host_table = np.asarray(table)
    want = 0
    for r in range(R):
        want += host_table[idx + r].sum(dtype=np.int64)
    got = int(np.asarray(run(table, idx2)))  # compile + warm
    # int32 wraparound-safe compare
    assert np.int32(got) == np.int32(want), (got, want)

    t0 = time.perf_counter()
    for _ in range(reps):
        got = int(np.asarray(run(table, idx2)))
    dt = (time.perf_counter() - t0) / reps
    rows_per_s = q / dt
    return {
        "nb": nb, "q": q, "T": T, "K": K, "R": R,
        "ms": round(dt * 1e3, 2),
        "M_dmas_per_s": round(rows_per_s / 1e6, 2),
        "GB_per_s": round(rows_per_s * R * WIDTH * 4 / 1e9, 2),
    }


def xla_case(nb: int, q: int, table=None, reps: int = 3):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    if table is None:
        table = jnp.asarray(
            rng.integers(0, 1 << 30, size=(nb, WIDTH), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, nb - 1, size=q, dtype=np.int32))

    @jax.jit
    def run(table, idx):
        return jnp.take(table, idx, axis=0).sum(dtype=jnp.int32)

    np.asarray(run(table, idx))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(run(table, idx))
    dt = (time.perf_counter() - t0) / reps
    return {"nb": nb, "q": q, "ms": round(dt * 1e3, 2),
            "M_rows_per_s": round(q / dt / 1e6, 2),
            "GB_per_s": round(q / dt * WIDTH * 4 / 1e9, 2)}


def dyngather_case(interpret: bool = False, reps: int = 3):
    """Can Mosaic lower an in-VMEM vectorized row gather on this
    backend?  (jnp.take_along_axis axis=0 -> tpu.dynamic_gather; the
    r2/r3 HTTP-500 was at the XLA-lowering layer, re-tested here inside
    a kernel.)  This is the primitive a sort+scan-join probe kernel
    would need for within-tile matching."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TB = 1024  # tile rows

    def kernel(tile_ref, locb_ref, out_ref):
        idx = locb_ref[:]  # (TB, 128) int32, row index broadcast per lane
        out_ref[:] = jnp.take_along_axis(tile_ref[:], idx, axis=0)

    @jax.jit
    def run(tile, locb):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TB, WIDTH), jnp.int32),
            interpret=interpret,
        )(tile, locb).sum()

    rng = np.random.default_rng(3)
    tile = rng.integers(0, 1 << 30, size=(TB, WIDTH), dtype=np.int32)
    locb = np.broadcast_to(
        rng.integers(0, TB, size=(TB, 1), dtype=np.int32),
        (TB, WIDTH)).copy()
    want = tile[locb[:, 0]].sum(dtype=np.int64)
    got = int(np.asarray(run(tile, locb)))
    assert np.int32(got) == np.int32(want), (got, want)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(run(tile, locb))
    dt = (time.perf_counter() - t0) / reps
    return {"kind": "in_kernel_dynamic_gather", "TB": TB,
            "us": round(dt * 1e6, 1),
            "M_rows_per_s": round(TB / dt / 1e6, 2)}


def selftest():
    import jax

    jax.config.update("jax_platforms", "cpu")
    for T, K, R in ((1024, 8, 1), (1024, 4, 2), (2048, 16, 1)):
        for space in ("smem", "vmem"):
            r = run_case(nb=4096, q=4096, T=T, K=K, R=R, interpret=True,
                         reps=1, idx_space=space)
            print(f"selftest ok ({space}):", r)
    print("selftest ok:", dyngather_case(interpret=True, reps=1))


def chip(args):
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)
    results = []

    # small (cache-regime) shakeout first: cheap compile, quick sanity
    cases = [("small", 1 << 17, 1 << 21)]  # 67 MB, 2M queries
    if "big" in args:
        cases.append(("big", 1 << 23, 1 << 21))  # 4.3 GB, 2M queries
    kcfgs = [(1024, 16, 1)]
    if "sweep" in args:
        kcfgs += [(1024, 64, 1), (1024, 16, 4)]

    if "dyngather" in args:
        try:
            r = dyngather_case()
        except Exception as e:  # noqa: BLE001 — record compile fails
            r = {"kind": "in_kernel_dynamic_gather", "error": repr(e)[:500]}
        print(json.dumps(r), flush=True)
        results.append(r)

    for name, nb, q in cases:
        rng = np.random.default_rng(1)
        print(f"[{name}] placing {nb * WIDTH * 4 / 1e9:.2f} GB table...",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        # one host allocation (fits this host's RAM), transferred once;
        # kept for the per-config correctness checksums
        host = rng.integers(0, 1 << 30, size=(nb, WIDTH), dtype=np.int32)
        table = jax.device_put(host, dev)
        table.block_until_ready()
        print(f"[{name}] placed in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr, flush=True)

        r = xla_case(nb, q, table=table)
        r["kind"] = f"xla_gather_{name}"
        print(json.dumps(r), flush=True)
        results.append(r)

        for T, K, R in kcfgs:
            for space in ("smem", "vmem"):
                try:
                    r = run_case(nb, q, T=T, K=K, R=R, interpret=False,
                                 table=table, idx_space=space,
                                 host_table=host)
                    r["kind"] = f"pallas_dma_{name}_{space}"
                except Exception as e:  # noqa: BLE001 — record fails
                    r = {"kind": f"pallas_dma_{name}_{space}", "T": T,
                         "K": K, "R": R, "error": repr(e)[:500]}
                print(json.dumps(r), flush=True)
                results.append(r)
                if "error" not in r:
                    break  # smem worked; no need for the fallback

    with open("/tmp/exp_pallas_dma.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "selftest":
        selftest()
    else:
        chip(sys.argv[1:])
