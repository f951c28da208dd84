"""Protein-input pipelines for the FGSpp gene-prediction front end.

When FGSpp supplies predicted proteins, the precision presets skip the
6-frame translation and run ``prot2kmer2lca | seedextend | uniq |
taxa2agg`` directly over gene records
(/root/reference/scripts/umgap-analyse.sh:299-311).  Each read group
carries up to E predicted genes as lanes (the analogue of the 6 frames
in the self-contained pipelines); the tryptic presets digest the
proteins on host (prot2tryp2lca, exact) and probe/aggregate on device.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..agg import device as devagg
from ..ops import encoding, kmers as kmerops, lookup, seedextend
from .fused import PipelineConfig
from .runner import Analyser
from .tryptic import MAX_PEP, MIN_PEP, make_tryptic_pipeline


def protein_pipeline_step(aa, plens, dtax, dtable, config: PipelineConfig,
                          euler=None, with_overflow: bool = False):
    """The fused 9-mer pipeline minus translation: (B, E, P) AA codes
    with E gene lanes per read group -> per-group consensus taxon."""
    B, E, P = aa.shape
    hi, lo, wvalid = kmerops.pack_windows_batch(aa, plens, config.k)
    taxa, _found = lookup.probe(dtable, hi, lo, valid=wvalid, default=0)
    taxa = jnp.where(wvalid, taxa, 0)  # (B, E, W)
    W = taxa.shape[-1]
    nkmers = jnp.maximum(plens - (config.k - 1), 0)  # (B, E)
    keep = seedextend.seedextend_mask_batch(
        taxa, nkmers, config.min_seed_size, config.max_gap_size)
    hits = jnp.where(keep, taxa, 0).reshape(B, E * W)
    utaxa, ucounts, uvalid, nuniq = devagg.dedup_counts(
        hits, jnp.ones_like(hits, jnp.float32), config.k_max,
        return_nuniq=True)
    uvalid = devagg.filter_lower_bound(ucounts, uvalid, config.lower_bound)
    agg = devagg.aggregate_batch(
        dtax, utaxa, ucounts, uvalid, config.method, config.strategy,
        config.factor, euler=euler)
    snapped = devagg.snap_batch(dtax.snap_valid, agg, default=0)
    taxon = jnp.where(uvalid.any(axis=-1), snapped, 1).astype(jnp.int32)
    if with_overflow:
        return taxon, nuniq > config.k_max
    return taxon


class ProteinAnalyser(Analyser):
    """Streaming analyser over FGSpp gene groups: same batching /
    overflow machinery as the 9-mer Analyser, but the inputs are AA
    codes (B, E, P) — ``ends`` is the gene-lane count and
    ``read_length`` the protein width bucket.  AA codes need 5 bits, so
    there is no 4-bit packed wire here (gene batches are tiny relative
    to the read stream)."""

    def _make_step(self, config: PipelineConfig, with_overflow: bool):
        @jax.jit
        def step(aa, plens, dtable, dtax, euler):
            return protein_pipeline_step(aa, plens, dtax, dtable, config,
                                         euler, with_overflow=with_overflow)

        return lambda aa, plens: step(aa, plens, self.dtable, self.dtax,
                                      self._euler)

    def _exact_kmax(self) -> int:
        return self.ends * max(self.read_length - 8, 1)

    def _dispatch(self, dna, lens):
        return self.step(jax.device_put(dna), jax.device_put(lens))

    def _wide_call(self, wide, nd, nl):
        return wide(jnp.asarray(nd), jnp.asarray(nl))


def encode_protein_groups(groups, ends: int, length: int):
    """(header, [proteins]) groups -> (B, E, P) AA codes + lengths
    (gene lanes beyond ``ends`` and residues beyond ``length`` clip —
    callers bucket both from the sample's maxima)."""
    B = len(groups)
    aa = np.zeros((B, ends, length), dtype=np.uint8)
    lens = np.zeros((B, ends), dtype=np.int32)
    for i, (_h, prots) in enumerate(groups):
        for e, p in enumerate(prots[:ends]):
            codes = encoding.encode_aa(p)[:length]
            aa[i, e, : len(codes)] = codes
            lens[i, e] = len(codes)
    return aa, lens


def analyse_protein_groups(groups, tax, table, config: PipelineConfig,
                           batch_size: int = 1024, dtax=None, dtable=None,
                           analyser_cache=None):
    """FGSpp gene groups through the k-mer precision pipeline (exact:
    lane count and width bucket from the sample's maxima; overflow
    re-routed). Yields (header, taxon) in order.  ``analyser_cache``
    keeps the jitted programs hot across samples/requests with matching
    shape buckets."""
    groups = list(groups)
    if not groups:
        return
    ends = max(1, max(len(p) for _h, p in groups))
    width = max(16, max((len(s) for _h, ps in groups for s in ps),
                        default=16))
    # round up to keep program shapes bucketed
    ends = 1 << (ends - 1).bit_length()
    width = 1 << (width - 1).bit_length()
    B = min(batch_size, 1 << max(1, (len(groups) - 1)).bit_length())
    key = (config, B, width, ends)
    an = analyser_cache.get(key) if analyser_cache is not None else None
    if an is None:
        an = ProteinAnalyser(tax, table, config, batch_size=B,
                             read_length=width, ends=ends,
                             dtax=dtax, dtable=dtable)
        if analyser_cache is not None:
            analyser_cache[key] = an
    else:
        an.reset()
    for i in range(0, len(groups), B):
        chunk = groups[i : i + B]
        aa, lens = encode_protein_groups(chunk, ends, width)
        yield from an.feed([h for h, _ in chunk], aa, lens)
    yield from an.finish()


def digest_protein_groups(groups, max_peptides: int,
                          min_len: int = MIN_PEP, max_len: int = MAX_PEP):
    """Host tryptic digest of FGSpp protein groups (no translation —
    the proteins ARE the genes): (hi, lo, valid) fingerprint batches
    for the peptide-table probe (prot2tryp2lca -l9 -L45 semantics)."""
    from ..index.table import _fingerprints

    B = len(groups)
    frags: List[str] = []
    owners: List[Tuple[int, int]] = []
    counts = np.zeros(B, dtype=np.int64)
    for b, (_h, prots) in enumerate(groups):
        for pep in prots:
            for frag in kmerops.tryptic_digest(pep):
                if min_len <= len(frag) <= max_len:
                    owners.append((b, int(counts[b])))
                    frags.append(frag)
                    counts[b] += 1
    W = max_peptides
    widest = int(counts.max()) if B else 0
    while W < widest:  # width-bucketed, never silently dropped
        W *= 2
    hi = np.zeros((B, W), dtype=np.int32)
    lo = np.zeros((B, W), dtype=np.int32)
    valid = np.zeros((B, W), dtype=bool)
    if frags:
        h1, h2 = _fingerprints(frags)
        for i, (b, slot) in enumerate(owners):
            hi[b, slot] = h1[i]
            lo[b, slot] = h2[i]
            valid[b, slot] = True
    return hi, lo, valid


def analyse_tryptic_protein_groups(groups, tax, table,
                                   config: PipelineConfig,
                                   batch_size: int = 1024,
                                   max_peptides: int = 128,
                                   dtax=None, dtable=None,
                                   step_cache=None):
    """FGSpp gene groups through prot2tryp2lca + taxa2agg (host digest,
    device probe/aggregate). Yields (header, taxon) in order."""
    groups = list(groups)
    if not groups:
        return
    dtax = dtax if dtax is not None else devagg.DeviceTaxonomy.from_host(tax)
    dtable = dtable if dtable is not None else \
        lookup.DeviceTable.from_host(table)
    B = min(batch_size, 1 << max(1, (len(groups) - 1)).bit_length())
    step = step_cache.get(config) if step_cache is not None else None
    if step is None:
        step = make_tryptic_pipeline(dtax, dtable, config, max_peptides)
        if step_cache is not None:
            step_cache[config] = step
    for i in range(0, len(groups), B):
        chunk = groups[i : i + B]
        padded = chunk + [("", [])] * (B - len(chunk))
        hi, lo, valid = digest_protein_groups(padded, max_peptides)
        taxa = np.asarray(step(hi, lo, valid))
        for (header, _), t in zip(chunk, taxa[: len(chunk)]):
            yield header, int(t)
