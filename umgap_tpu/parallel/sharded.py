"""Sharded k-mer table with all-to-all probe routing.

The reference keeps one full copy of the ~100 GB FST per host
(/root/reference/src/commands/prot2kmer2lca.rs:109-114). TPU-native
design: partition keys by a hash-range function across the mesh, keep
one shard per device in HBM, and for each batch route every query to its
owner shard with ``lax.all_to_all``, probe locally, and route results
back. Reads stay data-parallel on the same mesh axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.table import KmerTable, build_kmer_table, hash32
from ..ops import kmers as kmerops
from ..ops import lookup


def owner_of(hi, lo, n_shards: int):
    """Shard owner by range-partitioning the hash's upper 16 bits (the
    slot index uses the lower bits, keeping the two independent)."""
    h = hash32(hi, lo) if isinstance(hi, np.ndarray) else lookup.hash32_device(hi, lo)
    top = (h >> 16).astype(jnp.uint32 if not isinstance(hi, np.ndarray) else np.uint32)
    return ((top * np.uint32(n_shards)) >> np.uint32(16)).astype(
        np.int32 if isinstance(hi, np.ndarray) else jnp.int32
    )


def build_sharded_tables(packed: np.ndarray, values: np.ndarray, k: int,
                         n_shards: int, load_factor: float = 0.4,
                         layout: str = "bucket8s"):
    """Split keys by owner and build per-shard tables with one common
    capacity (so the stacked arrays are rectangular). Grows the common
    capacity until every shard builds within its probe limits."""
    from ..index.table import BUCKET, MIN_NB_BITS, _pow2_capacity

    packed = packed.astype(np.uint64)
    hi, lo = kmerops.split_packed(packed)
    owner = owner_of(hi, lo, n_shards)
    max_n = max(
        (int((owner == s).sum()) for s in range(n_shards)), default=1)
    cap = _pow2_capacity(max_n, load_factor, BUCKET << MIN_NB_BITS)
    # Build shard-by-shard; a shard that fails its probe limits doubles
    # the COMMON capacity and only the failed/remaining shards rebuild
    # (already-built smaller shards are rebuilt once at the end so all
    # stacked rows stay rectangular).
    shards: list = []
    s = 0
    grew = False
    while s < n_shards:
        try:
            shards.append(
                build_kmer_table(packed[owner == s], values[owner == s], k,
                                 layout=layout, capacity=cap))
            s += 1
        except RuntimeError:
            cap *= 2
            grew = True
    if grew:
        shards = [
            t if t.capacity == cap else build_kmer_table(
                packed[owner == i], values[owner == i], k,
                layout=layout, capacity=cap)
            for i, t in enumerate(shards)
        ]
    return shards


@jax.tree_util.register_pytree_node_class
class ShardedTable:
    """Stacked packed shard rows, shard axis laid out over the mesh
    (registered pytree; pass as a jit argument)."""

    def __init__(self, rows, max_probes: int, n_shards: int, kind: str,
                 nb_bits: int, bucket: int, stash=None):
        self.rows = rows  # (n_shards, n_buckets, row_width) int32
        self.max_probes = max_probes
        self.n_shards = n_shards
        self.kind = kind
        self.nb_bits = nb_bits
        self.bucket = bucket
        # (n_shards, S, 3) int32 [key_hi, key_lo, value]; rows padded
        # with key_hi = -1 (impossible: packed hi has <= 20 bits)
        self.stash = (jnp.zeros((n_shards, 0, 3), jnp.int32)
                      if stash is None else stash)

    def tree_flatten(self):
        return (self.rows, self.stash), (self.max_probes, self.n_shards,
                                         self.kind, self.nb_bits, self.bucket)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux, stash=children[1])

    @classmethod
    def from_shards(cls, shards, mesh: Mesh, axis: str = "x") -> "ShardedTable":
        n = len(shards)
        sharding = NamedSharding(mesh, P(axis, None, None))
        stacked = np.stack([lookup.pack_rows(t) for t in shards])
        t0 = shards[0]
        if t0.kind == "kmer":
            nb_bits = t0.nb_bits
        elif t0.kind == "cuckoo":
            nb_bits = t0.s_bits
        else:
            nb_bits = 0
        smax = max((len(getattr(t, "stash_hi", [])) for t in shards),
                   default=0)
        stash = np.full((n, smax, 3), -1, np.int32)
        stash[:, :, 2] = 0
        for i, t in enumerate(shards):
            sh = getattr(t, "stash_hi", None)
            if sh is not None and len(sh):
                stash[i, : len(sh), 0] = sh
                stash[i, : len(sh), 1] = t.stash_lo
                stash[i, : len(sh), 2] = t.stash_val
        return cls(
            rows=jax.device_put(stacked, sharding),
            max_probes=max(t.max_probes for t in shards),
            n_shards=n,
            kind=t0.kind,
            nb_bits=nb_bits,
            bucket=getattr(t0, "bucket", 8),
            stash=jax.device_put(stash, sharding),
        )


def sharded_probe_local(local_hi, local_lo, local_valid,
                        shard_rows, max_probes: int,
                        axis, default: int = 0,
                        kind: str = "kmer", nb_bits: int = 0,
                        bucket: int = 8, shard_stash=None):
    """Probe inside shard_map: local queries of any shape; the local
    table shard's packed rows. Routes via all_to_all both ways.
    ``axis`` may be one mesh axis name or a tuple of names (host, chip)
    — collectives then span the flattened product axis."""
    n = jax.lax.psum(1, axis)
    shape = local_hi.shape
    hi = local_hi.reshape(-1)
    lo = local_lo.reshape(-1)
    valid = local_valid.reshape(-1)
    B = hi.shape[0]

    owner = owner_of(hi, lo, n)
    owner = jnp.where(valid, owner, 0)

    # stable sort by owner; rank within owner group
    order = jnp.argsort(owner, stable=True)
    inv = jnp.argsort(order, stable=True)  # query -> sorted position
    sorted_owner = owner[order]
    counts = jax.ops.segment_sum(jnp.ones_like(owner), owner, num_segments=n)
    starts = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(counts)[:-1]])
    rank = jnp.arange(B, dtype=jnp.int32) - starts[sorted_owner].astype(jnp.int32)

    # scatter into (n, B) buckets
    def bucketize(x, fill):
        buckets = jnp.full((n, B), fill, x.dtype)
        return buckets.at[sorted_owner, rank].set(x[order])

    b_hi = bucketize(hi, jnp.int32(-1))
    b_lo = bucketize(lo, jnp.int32(-1))
    b_valid = bucketize(valid, False)

    # exchange: row j of the result = queries device j sends to me
    r_hi = jax.lax.all_to_all(b_hi, axis, 0, 0, tiled=False)
    r_lo = jax.lax.all_to_all(b_lo, axis, 0, 0, tiled=False)
    r_valid = jax.lax.all_to_all(b_valid, axis, 0, 0, tiled=False)

    local_table = lookup.DeviceTable(shard_rows, max_probes, kind, nb_bits,
                                     bucket, stash=shard_stash)
    vals, found = lookup.probe(local_table, r_hi, r_lo, valid=r_valid,
                               default=default)

    # route results back and unscatter
    back_vals = jax.lax.all_to_all(vals, axis, 0, 0, tiled=False)
    back_found = jax.lax.all_to_all(found, axis, 0, 0, tiled=False)
    out_sorted_v = back_vals[sorted_owner, rank]
    out_sorted_f = back_found[sorted_owner, rank]
    out_v = out_sorted_v[inv]
    out_f = out_sorted_f[inv]
    out_v = jnp.where(valid, out_v, default)
    out_f = out_f & valid
    return out_v.reshape(shape), out_f.reshape(shape)


def make_sharded_pipeline(dtax, stable: ShardedTable, config, mesh: Mesh,
                          axis="x", n_ranks: int | None = None):
    """The fused pipeline under shard_map: reads data-parallel over the
    mesh, table sharded over the same axis, probes routed all-to-all,
    plus a psum-merged frequency vector over the FULL rank-snapped taxon
    space (the taxa2freq analogue; see parallel/freq.py for the
    standalone byte-identical command path)."""
    if n_ranks is None:
        n_ranks = int(dtax.snap_ranked.shape[0])
    from jax import shard_map

    from ..agg import device as devagg
    from ..ops import encoding, seedextend, translate
    from ..pipeline.fused import PipelineConfig

    table = encoding.get_table(config.table_number)

    def local_step(dna, lengths, shard_rows, shard_stash):
        # shard axis arrives with a leading length-1 mesh dim
        shard_rows = shard_rows[0]
        shard_stash = shard_stash[0]
        B, E, L = dna.shape
        aa, plens = translate.translate6_batch(
            dna.reshape(B * E, L), lengths.reshape(B * E), table)
        hi, lo, wvalid = kmerops.pack_windows_batch(aa, plens, config.k)
        taxa, _found = sharded_probe_local(
            hi, lo, wvalid, shard_rows,
            stable.max_probes, axis, default=0,
            kind=stable.kind, nb_bits=stable.nb_bits, bucket=stable.bucket,
            shard_stash=shard_stash)
        taxa = jnp.where(wvalid, taxa, 0)
        W = taxa.shape[-1]
        nk = jnp.maximum(plens - (config.k - 1), 0)
        keep = seedextend.seedextend_mask_batch(
            taxa, nk, config.min_seed_size, config.max_gap_size)
        hits = jnp.where(keep, taxa, 0).reshape(B, E * 6 * W)
        utaxa, ucounts, uvalid = devagg.dedup_counts(
            hits, jnp.ones_like(hits, jnp.float32), config.k_max)
        uvalid = devagg.filter_lower_bound(ucounts, uvalid, config.lower_bound)
        agg = devagg.aggregate_batch(
            dtax, utaxa, ucounts, uvalid, config.method, config.strategy,
            config.factor)
        snapped = devagg.snap_batch(dtax.snap_valid, agg, default=0)
        nonempty = uvalid.any(axis=-1)
        out = jnp.where(nonempty, snapped, 1).astype(jnp.int32)

        # taxa2freq analogue: per-rank counts, psum-merged across chips
        ranks_of = devagg.snap_batch(dtax.snap_ranked, out, default=0)
        freq = jax.ops.segment_sum(
            jnp.ones_like(ranks_of, jnp.float32),
            jnp.clip(ranks_of, 0, n_ranks - 1),
            num_segments=n_ranks)
        freq = jax.lax.psum(freq, axis)
        return out, freq

    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis, None, None),
                  P(axis, None, None)),
        out_specs=(P(axis), P()),
        check_vma=False,
    )  # ``axis`` may be a tuple (host, chip): reads and table shards
    # then split over the flattened product axis, host-major

    @jax.jit
    def step(dna, lengths, rows, stash):
        return fn(dna, lengths, rows, stash)

    return lambda dna, lengths: step(dna, lengths, stable.rows, stable.stash)
