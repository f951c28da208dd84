"""Device-side table probing.

The probe is the throughput core of the whole framework — the analogue
of the reference's ``fst.get`` per k-mer hot loop
(/root/reference/src/commands/prot2kmer2lca.rs:174-179). Here a whole
batch of packed k-mers probes an HBM-resident open-addressing table with
vectorized gathers inside a short ``lax.while_loop`` (bounded by the
table's build-time maximum probe distance; the common case resolves in
one round: hit or empty slot).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_C1 = 0x9E3779B1
_C2 = 0x85EBCA77
_C3 = 0xC2B2AE3D


class DeviceTable(NamedTuple):
    """Device-resident view of an index table."""

    key_hi: jax.Array  # (cap,) int32, -1 = empty
    key_lo: jax.Array  # (cap,) int32
    values: jax.Array  # (cap,) int32
    max_probes: int  # static

    @classmethod
    def from_host(cls, table, device=None) -> "DeviceTable":
        put = (lambda x: jax.device_put(x, device)) if device else jnp.asarray
        return cls(
            put(table.key_hi), put(table.key_lo), put(table.values),
            int(table.max_probes),
        )


def hash32_device(hi: jax.Array, lo: jax.Array) -> jax.Array:
    h = (hi.astype(jnp.uint32) * np.uint32(_C1)) ^ (
        lo.astype(jnp.uint32) * np.uint32(_C2)
    )
    h = h ^ (h >> 16)
    h = h * np.uint32(_C3)
    h = h ^ (h >> 13)
    return h


def probe(table: DeviceTable, hi: jax.Array, lo: jax.Array,
          valid: jax.Array | None = None, default: int = 0):
    """Look up packed keys. Returns (values, found).

    Args:
      table: device table arrays.
      hi, lo: int32 key lanes, any shape.
      valid: optional bool mask; invalid lanes return ``default``/False.
      default: value for misses (0 reproduces the reference's `-o`).
    """
    cap = table.values.shape[0]
    mask = jnp.uint32(cap - 1)
    slot = (hash32_device(hi, lo) & mask).astype(jnp.int32)
    live = jnp.ones(hi.shape, dtype=bool) if valid is None else valid
    out = jnp.full(hi.shape, default, dtype=jnp.int32)
    found = jnp.zeros(hi.shape, dtype=bool)

    def cond(state):
        i, live, _, _, _ = state
        return jnp.logical_and(i <= table.max_probes, live.any())

    def body(state):
        i, live, slot, out, found = state
        kh = jnp.take(table.key_hi, slot, axis=0)
        kl = jnp.take(table.key_lo, slot, axis=0)
        v = jnp.take(table.values, slot, axis=0)
        hit = live & (kh == hi) & (kl == lo)
        out = jnp.where(hit, v, out)
        found = found | hit
        empty = kh == jnp.int32(-1)
        live = live & ~hit & ~empty
        slot = (slot + 1) & jnp.int32(cap - 1)
        return i + 1, live, slot, out, found

    _, _, _, out, found = jax.lax.while_loop(
        cond, body, (jnp.int32(0), live, slot, out, found)
    )
    return out, found
