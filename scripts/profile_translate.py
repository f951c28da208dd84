"""Micro-profile of translate6_batch internals on the current device."""

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

from umgap_tpu.ops import encoding, translate


def bench(name, fn, *args, iters=16):
    r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:24s} {dt*1e3:8.2f} ms")


def main():
    rng = np.random.default_rng(0)
    B, L = 8192, 100
    P = L // 3
    dna = jnp.asarray(rng.integers(0, 4, size=(B, L)).astype(np.uint8))
    lengths = jnp.asarray(np.full(B, L, dtype=np.int32))
    table = encoding.get_table(1)

    @jax.jit
    def full(dna, lengths):
        aa, pl = translate.translate6_batch(dna, lengths, table)
        return jnp.sum(aa.astype(jnp.int32)) + jnp.sum(pl)

    bench("full translate6", full, dna, lengths)

    @jax.jit
    def rc_only(dna, lengths):
        d = dna.astype(jnp.int32)
        pos = jnp.arange(L, dtype=jnp.int32)[None, :]
        rc_idx = jnp.clip(lengths[:, None] - 1 - pos, 0, L - 1)
        rc = jnp.take_along_axis(d, rc_idx, axis=1)
        rc = jnp.where(rc < 4, 3 - rc, 4)
        return jnp.sum(rc)

    bench("rc gather", rc_only, dna, lengths)

    @jax.jit
    def slices_only(dna):
        d = dna.astype(jnp.int32)
        dp = jnp.pad(d, ((0, 0), (0, 3)), constant_values=4)
        tot = jnp.int32(0)
        for off in range(3):
            c0 = jax.lax.slice(dp, (0, off), (B, off + 3 * (P - 1) + 1), (1, 3))
            c1 = jax.lax.slice(dp, (0, off + 1), (B, off + 1 + 3 * (P - 1) + 1), (1, 3))
            c2 = jax.lax.slice(dp, (0, off + 2), (B, off + 2 + 3 * (P - 1) + 1), (1, 3))
            tot = tot + jnp.sum(c0 * 25 + c1 * 5 + c2)
        return tot

    bench("strided slices x9", slices_only, dna)

    @jax.jit
    def bitplane_only(dna):
        d = dna.astype(jnp.int32)
        codon = (d[:, :P] * 25 + d[:, 1:P + 1] * 5 + d[:, 2:P + 2])
        planes = translate._bitplane_constants(table.aa, 5)
        tot = jnp.uint32(0)
        for _ in range(6):
            tot = tot + jnp.sum(translate._bitplane_lookup(codon, planes, 5))
        return tot

    bench("bitplane x6", bitplane_only, dna)

    @jax.jit
    def stack_only(dna):
        d = dna.astype(jnp.int32)
        fs = [jnp.where(d[:, :P] > 0, jnp.uint8(1), jnp.uint8(0)) for _ in range(6)]
        return jnp.sum(jnp.stack(fs, axis=1).astype(jnp.int32))

    bench("uint8 stack x6", stack_only, dna)


if __name__ == "__main__":
    main()
