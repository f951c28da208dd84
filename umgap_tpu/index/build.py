"""Offline index construction.

Mirrors the reference's three-stage build —
``splitkmers | sort | joinkmers | buildindex``
(/root/reference/src/commands/splitkmers.rs, joinkmers.rs,
buildindex.rs) — with the same aggregation semantics (tree-hybrid with
factor 0.95, valid-ancestor snapping before aggregation, rank snapping
after; joinkmers.rs:62-80) but emitting packed hash tables instead of
FSTs.
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Optional, Tuple

import numpy as np

from .. import ranks
from ..agg.host import TreeMix, count as agg_count, AggError
from ..ops import encoding, kmers
from ..taxonomy import NONE, Taxonomy
from .table import PeptideTable, build_kmer_table

JOINKMERS_FACTOR = 0.95


def split_kmers(
    rows: Iterable[Tuple[int, str]], k: int = kmers.DEFAULT_K,
    prefix: str = "",
) -> Iterator[Tuple[str, int]]:
    """(taxid, protein) rows -> (kmer, taxid) rows
    (src/commands/splitkmers.rs:53-82). With ``prefix`` (one char), emits
    only the (k-1)-suffix of k-mers starting with that char."""
    byte = prefix[0] if prefix else None
    for tid, seq in rows:
        if len(seq) < k:
            continue
        for i in range(len(seq) - k + 1):
            kmer = seq[i : i + k]
            if byte is not None:
                if kmer[0] == byte:
                    yield kmer[1:], tid
            else:
                yield kmer, tid


def join_kmers(
    rows: Iterable[Tuple[str, int]], tax: Taxonomy
) -> Iterator[Tuple[str, int, str]]:
    """Group sorted (kmer, taxid) rows by kmer, aggregate each group with
    tree-hybrid f=0.95, and emit (kmer, snapped taxon, rank name)
    (src/commands/joinkmers.rs:53-104)."""
    ranksnap = tax.snapping(ranked_only=True)
    validsnap = tax.snapping(ranked_only=False)
    aggregator = TreeMix(tax, JOINKMERS_FACTOR)

    def emit(kmer: str, tids: List[Tuple[int, float]]):
        counts = agg_count(iter(tids))
        if not counts:
            return None
        try:
            aggregate = aggregator.aggregate(counts)
        except AggError:
            return None
        taxon = int(ranksnap[aggregate])
        rank = ranks.rank_name(int(tax.rank[taxon]))
        return (kmer, taxon, rank)

    current: Optional[str] = None
    tids: List[Tuple[int, float]] = []
    for kmer, tid in rows:
        if current is not None and current != kmer:
            out = emit(current, tids)
            if out:
                yield out
            tids = []
        current = kmer
        if 0 <= tid < tax.size:
            snapped = validsnap[tid]
            if snapped != NONE:
                tids.append((int(snapped), 1.0))
    if current is not None:
        out = emit(current, tids)
        if out:
            yield out


def build_kmer_index_fast(tsv: bytes, tax: Taxonomy, k: int = kmers.DEFAULT_K,
                          group_cap: int = 64, use_native: bool = True):
    """Fast end-to-end 9-mer index build: native C++ k-mer splitting,
    numpy sort (the reference shells out to GNU sort), and the at-scale
    grouped joinkmers aggregation (valid-ancestor snap -> tree-hybrid
    f=0.95 -> ranked snap, /root/reference/src/commands/joinkmers.rs:62-104)
    via :func:`umgap_tpu.index.scale.join_kmers_sorted` — multithreaded
    native C++ when available, vectorized numpy otherwise.

    Returns a built :class:`KmerTable`.
    """
    from ..io import native
    from .scale import join_kmers_sorted

    packed, tids = native.split_kmers_tsv(tsv, k=k)
    if len(packed) == 0:
        return build_kmer_table(packed, np.zeros(0, np.int32), k=k)
    order = np.argsort(packed, kind="stable")
    packed = packed[order]
    tids = tids[order].astype(np.int64)
    keys, values = join_kmers_sorted(packed, tids, tax, group_cap=group_cap,
                                     use_native=use_native)
    return build_kmer_table(keys, values, k=k)


def build_table(rows: Iterable[Tuple[str, int]], kind: str = "auto"):
    """Sorted (string, value) rows -> a packed table
    (buildindex equivalent, src/commands/buildindex.rs:32-48).

    ``kind``: "kmer" (fixed-length keys <= 10, exact packing),
    "peptide" (fingerprints), or "auto" (kmer iff all keys share one
    length <= 10).
    """
    keys: List[str] = []
    values: List[int] = []
    for key, v in rows:
        keys.append(key)
        values.append(int(v))
    if len(set(keys)) != len(keys):
        # table probes assume unique keys (a duplicate would land two
        # matching slots in one bucket and corrupt the device lookup);
        # the reference's FST builder rejects duplicates too
        raise ValueError("duplicate keys in index input")
    vals = np.asarray(values, dtype=np.int32)
    if kind == "auto":
        lens = {len(s) for s in keys}
        # exact quotient tables hold <= 45-bit (9 x 5-bit) keys; longer
        # uniform keys route to the fingerprint table
        kind = "kmer" if len(lens) == 1 and keys and max(lens) <= 9 else "peptide"
    if kind == "kmer":
        if not keys:
            return build_kmer_table(np.zeros(0, np.uint64), vals, k=kmers.DEFAULT_K)
        k = len(keys[0])
        packed = np.zeros(len(keys), dtype=np.uint64)
        for i, s in enumerate(keys):
            packed[i] = kmers.pack_peptide_host(encoding.encode_aa(s))
        return build_kmer_table(packed, vals, k=k)
    return PeptideTable.build(keys, vals)
