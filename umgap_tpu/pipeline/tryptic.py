"""Fused tryptic pipelines.

The reference's tryptic presets run the external FragGeneScan++ gene
predictor, then ``prot2tryp2lca -l9 -L45 | uniq -d / | taxa2agg``
(/root/reference/scripts/umgap-analyse.sh:289-298). FGSpp is an optional
external binary in the reference too (README.md:44-46); self-contained
runs here use 6-frame translation as the protein front end, then the
tryptic digest. The digest is host-side (regex); peptide fingerprints
are computed vectorized and the probe + aggregation run fused on device.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..agg import device as devagg
from ..index.table import _FNV_OFFSET, _FNV_OFFSET2, _FNV_PRIME
from ..ops import encoding, kmers as kmerops, lookup, translate
from .fused import PipelineConfig

TRYPTIC_PRESETS = {
    "tryptic-sensitivity": PipelineConfig(
        "tryptic-sensitivity", lower_bound=1.0, method="rmq", strategy="mrtl"),
    "tryptic-precision": PipelineConfig(
        "tryptic-precision", lower_bound=5.0, method="rmq", strategy="mrtl"),
}

MIN_PEP, MAX_PEP = 9, 45


def fingerprints_batch(codes: np.ndarray, lengths: np.ndarray):
    """Vectorized FNV-1a fingerprints over padded AA code rows
    (identical to table.fingerprint_host per row)."""
    n, L = codes.shape
    h1 = np.full(n, _FNV_OFFSET, dtype=np.uint32)
    h2 = np.full(n, _FNV_OFFSET2, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for j in range(L):
            live = j < lengths
            c = codes[:, j].astype(np.uint32)
            h1 = np.where(live, (h1 ^ c) * _FNV_PRIME, h1)
            h2 = np.where(live, (h2 ^ (c + np.uint32(0x9E37))) * _FNV_PRIME, h2)
    h1 = np.where(h1 == np.uint32(0xFFFFFFFF), np.uint32(0), h1)
    return h1.astype(np.int32), h2.astype(np.int32)


def digest_groups(
    groups: Sequence[Tuple[str, Sequence[str]]],
    max_peptides: int,
    table_number: int = 1,
    min_len: int = MIN_PEP,
    max_len: int = MAX_PEP,
):
    """Translate all 6 frames of each end, digest, filter by length, and
    fingerprint. Returns (hi, lo, valid) of shape (B, max_peptides)."""
    table = encoding.get_table(table_number)
    B = len(groups)
    hi = np.zeros((B, max_peptides), dtype=np.int32)
    lo = np.zeros((B, max_peptides), dtype=np.int32)
    valid = np.zeros((B, max_peptides), dtype=bool)
    all_codes: List[np.ndarray] = []
    owners: List[Tuple[int, int]] = []
    counts = np.zeros(B, dtype=np.int64)
    for b, (_header, seqs) in enumerate(groups):
        for seq in seqs:
            for pep in translate.translate_sequence(
                    seq, translate.FRAME_NAMES, table):
                for frag in kmerops.tryptic_digest(pep):
                    if min_len <= len(frag) <= max_len and counts[b] < max_peptides:
                        owners.append((b, int(counts[b])))
                        all_codes.append(encoding.encode_aa(frag))
                        counts[b] += 1
    if all_codes:
        L = max(len(c) for c in all_codes)
        mat = np.zeros((len(all_codes), L), dtype=np.uint8)
        lens = np.zeros(len(all_codes), dtype=np.int64)
        for i, c in enumerate(all_codes):
            mat[i, : len(c)] = c
            lens[i] = len(c)
        h1, h2 = fingerprints_batch(mat, lens)
        for i, (b, slot) in enumerate(owners):
            hi[b, slot] = h1[i]
            lo[b, slot] = h2[i]
            valid[b, slot] = True
    return hi, lo, valid


def make_tryptic_pipeline(dtax: devagg.DeviceTaxonomy,
                          dtable: lookup.DeviceTable,
                          config: PipelineConfig, max_peptides: int = 128):
    """Jitted (hi, lo, valid) -> per-read taxon (probe + taxa2agg)."""

    @jax.jit
    def step(hi, lo, valid, dtable, dtax):
        taxa, found = lookup.probe(dtable, hi, lo, valid=valid, default=0)
        hits = jnp.where(found, taxa, 0)
        utaxa, ucounts, uvalid = devagg.dedup_counts(
            hits, jnp.ones_like(hits, jnp.float32), config.k_max)
        uvalid = devagg.filter_lower_bound(ucounts, uvalid, config.lower_bound)
        agg = devagg.aggregate_batch(
            dtax, utaxa, ucounts, uvalid, config.method, config.strategy,
            config.factor)
        snapped = devagg.snap_batch(dtax.snap_valid, agg, default=0)
        return jnp.where(uvalid.any(axis=-1), snapped, 1).astype(jnp.int32)

    return lambda hi, lo, valid: step(hi, lo, valid, dtable, dtax)


def analyse_tryptic_groups(groups, tax, table, config: PipelineConfig,
                           batch_size: int = 256, max_peptides: int = 128):
    """Host digest + device probe/aggregate over read groups."""
    dtax = devagg.DeviceTaxonomy.from_host(tax)
    dtable = lookup.DeviceTable.from_host(table)
    step = make_tryptic_pipeline(dtax, dtable, config, max_peptides)
    groups = list(groups)
    out = []
    for i in range(0, len(groups), batch_size):
        chunk = groups[i : i + batch_size]
        pad = batch_size - len(chunk)
        padded = chunk + [("", [])] * pad
        hi, lo, valid = digest_groups(padded, max_peptides,
                                      config.table_number)
        taxa = np.asarray(step(hi, lo, valid))
        for (header, _), t in zip(chunk, taxa[: len(chunk)]):
            out.append((header, int(t)))
    return out
