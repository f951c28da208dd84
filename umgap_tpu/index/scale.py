"""At-scale index construction (the "training job" analogue).

The reference builds its ~100 GB index as a cluster batch job:
``splitkmers | sort | joinkmers | buildindex``
(/root/reference/scripts/build-index-phanpy.hpc.sh:1-10,
src/commands/joinkmers.rs:53-104). Its joinkmers walks groups one k-mer
at a time through a pointer-built tree — fine for a stream, hopeless to
vectorize. This module is the scale path: fully segmented/vectorized
group aggregation over the sorted key array, with the exact joinkmers
semantics (valid-ancestor snap per row, tree-hybrid f=0.95 per group,
ranked snap of the result).

Shape of the computation:
* one lexsort of (key, snapped-tid) replaces the per-group HashMaps;
* duplicate (key, tid) pairs collapse to counts with one segmented diff;
* **singleton groups (one distinct taxon — the overwhelming majority in
  real UniProt-derived corpora) shortcut the aggregator entirely**: a
  tree-hybrid over {t: c} is t, so value = ranksnap[t] — pure gather;
* multi-taxon groups are bucketed by distinct-count (<=4, <=16, <=cap)
  and aggregated as dense (G, K) batches by a vectorized lineage-matrix
  TreeMix — numpy here (runs on any host of a build job), the same math
  as the device aggregator in umgap_tpu.agg.device.tree_mix_batch.

Per-shard memory is O(rows) int64 + the largest bucket batch, so a
billion-row shard fits a normal build host; shards parallelize by key
range exactly like the reference's ``splitkmers -p`` prefix partitioning
(src/commands/splitkmers.rs:47-49).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..taxonomy import NONE, Taxonomy

JOINKMERS_FACTOR = 0.95


def _tree_mix_np(utaxa: np.ndarray, ucounts: np.ndarray, valid: np.ndarray,
                 tax: Taxonomy, factor: float) -> np.ndarray:
    """Vectorized tree-hybrid over (G, K) groups of distinct taxa.

    Same realized semantics as the reference's Tree::collapse +
    aggregate + factor descent (src/tree/mix.rs:42-64); ties at a
    branching node break to the smallest child id (the package's
    documented pin)."""
    G, K = utaxa.shape
    safe = np.where(valid, np.clip(utaxa, 0, tax.size - 1), 0)
    lin = tax.lineage_rows(safe.reshape(-1)).reshape(G, K, -1)  # (G,K,D)
    D = lin.shape[-1]
    c = np.where(valid, ucounts, 0.0).astype(np.float32)
    x = np.full(G, tax.root, dtype=np.int64)
    base = c.sum(axis=1, dtype=np.float32)
    done = np.zeros(G, dtype=bool)
    I64MAX = np.iinfo(np.int64).max
    for d in range(D - 1):
        lin_d = lin[:, :, d]
        branch = lin[:, :, d + 1].astype(np.int64)
        below = valid & (branch != NONE) & (lin_d == x[:, None])
        any_below = below.any(axis=1)
        if not (any_below & ~done).any():
            break
        # per-j branch sums: sum of counts of i sharing j's branch
        eq = (branch[:, :, None] == branch[:, None, :]) & below[:, :, None] \
            & below[:, None, :]
        bsum = np.einsum("gij,gi->gj", eq, c).astype(np.float32)
        bsum = np.where(below, bsum, -np.inf)
        maxsum = bsum.max(axis=1)
        cand = below & (bsum == maxsum[:, None])
        best_branch = np.where(cand, branch, I64MAX).min(axis=1)
        bmin = np.where(below, branch, I64MAX).min(axis=1)
        bmax = np.where(below, branch, -1).max(axis=1)
        multi = any_below & (bmin != bmax)
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio_breaks = (maxsum / base) < np.float32(factor)
        descend = ~done & any_below & (~multi | ~ratio_breaks)
        stop = ~done & (~any_below | (multi & ratio_breaks))
        x = np.where(descend, np.where(multi, best_branch, bmin), x)
        base = np.where(descend & multi, maxsum, base).astype(np.float32)
        done |= stop
    return x


def join_kmers_sorted(
    packed: np.ndarray, tids: np.ndarray, tax: Taxonomy,
    group_cap: int = 64, batch: int = 262_144,
    use_native: bool = True, n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """joinkmers over sorted packed keys, fully vectorized.

    With ``use_native`` (default) and the C++ runtime available, the
    grouped aggregation runs in native/umgap_native.cpp
    (multithreaded; no group_cap truncation); the numpy path below is
    the portable fallback and the equivalence oracle.

    Args:
      packed: (N,) uint64 k-mer keys, ascending (duplicates = group).
      tids: (N,) taxon ids parallel to ``packed``.
      group_cap: bucketing granularity for the dense (G, K) batches —
        NOT a truncation: groups with more distinct taxa than
        ``group_cap`` run through one extra dynamically-sized bucket
        (with a logged note; real groups this wide are pathological),
        so both paths aggregate unlimited groups like the reference.

    Returns (keys, values): one rank-snapped taxon per surviving k-mer.
    """
    if len(packed) == 0:
        return packed, np.zeros(0, np.int32)
    validsnap = tax.snapping(ranked_only=False)
    ranksnap = tax.snapping(ranked_only=True)

    in_range = (tids >= 0) & (tids < tax.size)
    snapped = np.where(in_range, validsnap[np.clip(tids, 0, tax.size - 1)],
                       NONE)

    if use_native:
        try:
            from ..io.native import join_kmers_native

            return join_kmers_native(
                packed, snapped.astype(np.int64),
                np.where(tax.present, tax.parent, 0).astype(np.int32),
                ranksnap.astype(np.int32), JOINKMERS_FACTOR,
                n_threads=n_threads)
        except (RuntimeError, OSError):
            pass  # toolchain unavailable: numpy fallback below

    mask = snapped != NONE
    p = packed[mask]
    s = snapped[mask].astype(np.int64)
    if len(p) == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int32)

    order = np.lexsort((s, p))
    p = p[order]
    s = s[order]

    # distinct (key, tid) pairs with counts
    pair_new = np.empty(len(p), dtype=bool)
    pair_new[0] = True
    pair_new[1:] = (p[1:] != p[:-1]) | (s[1:] != s[:-1])
    pair_starts = np.flatnonzero(pair_new)
    pair_counts = np.diff(np.append(pair_starts, len(p))).astype(np.float32)
    pk = p[pair_starts]
    pt = s[pair_starts]

    # groups over distinct pairs
    grp_new = np.empty(len(pk), dtype=bool)
    grp_new[0] = True
    grp_new[1:] = pk[1:] != pk[:-1]
    gidx = np.cumsum(grp_new) - 1
    n_groups = int(gidx[-1]) + 1
    grp_starts = np.flatnonzero(grp_new)
    grp_sizes = np.diff(np.append(grp_starts, len(pk)))
    within = np.arange(len(pk)) - grp_starts[gidx]

    keys = pk[grp_starts]
    values = np.zeros(n_groups, dtype=np.int32)

    # ---- singleton fast path (vast majority) ------------------------- #
    single = grp_sizes == 1
    values[single] = ranksnap[pt[grp_starts[single]]]

    # ---- bucketed multi-taxon groups --------------------------------- #
    caps = [c for c in (4, 16, group_cap) if c <= group_cap]
    if caps and caps[-1] != group_cap:
        caps.append(group_cap)
    maxsz = int(grp_sizes.max())
    if maxsz > group_cap:
        # pathological ultra-wide groups: one dynamically-sized bucket
        # keeps the aggregation exact (the reference streams unlimited
        # groups too, src/commands/joinkmers.rs:53-104)
        from ..utils import log

        n_wide = int((grp_sizes > group_cap).sum())
        log(f"joinkmers: {n_wide} group(s) exceed group_cap={group_cap} "
            f"(widest {maxsz}); aggregating exactly in a wide bucket")
        caps.append(maxsz)
    prev = 1
    for cap in caps:
        sel = (grp_sizes > prev) & (grp_sizes <= cap)
        prev = cap
        g_ids = np.flatnonzero(sel)
        if len(g_ids) == 0:
            continue
        # compact group numbering for the selected groups
        lut = np.full(n_groups, -1, dtype=np.int64)
        lut[g_ids] = np.arange(len(g_ids))
        rows_sel = sel[gidx] & (within < cap)
        r = lut[gidx[rows_sel]]
        w = within[rows_sel]
        utaxa = np.zeros((len(g_ids), cap), dtype=np.int64)
        ucounts = np.zeros((len(g_ids), cap), dtype=np.float32)
        uvalid = np.zeros((len(g_ids), cap), dtype=bool)
        utaxa[r, w] = pt[rows_sel]
        ucounts[r, w] = pair_counts[rows_sel]
        uvalid[r, w] = True
        for lo in range(0, len(g_ids), batch):
            sl = slice(lo, lo + batch)
            agg = _tree_mix_np(utaxa[sl], ucounts[sl], uvalid[sl], tax,
                               JOINKMERS_FACTOR)
            values[g_ids[sl]] = ranksnap[agg]

    return keys, values
