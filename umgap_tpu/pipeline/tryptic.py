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
from .runner import Analyser

TRYPTIC_PRESETS = {
    "tryptic-sensitivity": PipelineConfig(
        "tryptic-sensitivity", lower_bound=1.0, method="rmq", strategy="mrtl"),
    "tryptic-precision": PipelineConfig(
        "tryptic-precision", lower_bound=5.0, method="rmq", strategy="mrtl"),
}

MIN_PEP, MAX_PEP = 9, 45


# one definition serves both call sites (identical to
# table.fingerprint_host per row)
from ..index.table import fingerprints_matrix as fingerprints_batch  # noqa: E402


def digest_groups(
    groups: Sequence[Tuple[str, Sequence[str]]],
    max_peptides: int,
    table_number: int = 1,
    min_len: int = MIN_PEP,
    max_len: int = MAX_PEP,
):
    """Translate all 6 frames of each end, digest, filter by length, and
    fingerprint.  Returns (hi, lo, valid) of shape (B, W) where W is the
    power-of-two bucket covering the WIDEST group's fragment count (at
    least ``max_peptides``) — nothing is ever silently dropped; callers
    compile one program per width bucket."""
    table = encoding.get_table(table_number)
    B = len(groups)
    all_codes: List[np.ndarray] = []
    owners: List[Tuple[int, int]] = []
    counts = np.zeros(B, dtype=np.int64)
    for b, (_header, seqs) in enumerate(groups):
        for seq in seqs:
            for pep in translate.translate_sequence(
                    seq, translate.FRAME_NAMES, table):
                for frag in kmerops.tryptic_digest(pep):
                    if min_len <= len(frag) <= max_len:
                        owners.append((b, int(counts[b])))
                        all_codes.append(encoding.encode_aa(frag))
                        counts[b] += 1
    W = max_peptides
    widest = int(counts.max()) if B else 0
    while W < widest:
        W *= 2
    hi = np.zeros((B, W), dtype=np.int32)
    lo = np.zeros((B, W), dtype=np.int32)
    valid = np.zeros((B, W), dtype=bool)
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


def tryptic_digest_device(aa: jax.Array, plens: jax.Array,
                          min_len: int = MIN_PEP, max_len: int = MAX_PEP):
    """Fully vectorized tryptic digest + FNV fingerprinting on device.

    Reproduces the realized semantics of the reference's double regex
    pass + '*' split (/root/reference/src/commands/prot2tryp.rs:57-64,
    equality-tested against :func:`umgap_tpu.ops.kmers.tryptic_digest`):
    a fragment boundary falls after every K/R whose successor is not P,
    and at every '*' (which is dropped). Fragments outside
    [min_len, max_len] are dropped at emission (prot2tryp2lca -l/-L).

    Args:
      aa: (R, P) uint8 AA codes (padded with anything beyond plens).
      plens: (R,) int32 valid lengths.

    Returns:
      (h1, h2, valid): (R, F) int32 fingerprint lanes + mask, fragments
      in left-to-right order, F = P // min_len + 1.
    """
    from ..ops.encoding import AA_STOP

    R, P = aa.shape
    a = aa.astype(jnp.int32)
    pos = jnp.arange(P, dtype=jnp.int32)
    inside = pos[None, :] < plens[:, None]
    member = inside & (a != AA_STOP)
    K, Rc, Pc = 10, 17, 15  # 'K'-'A', 'R'-'A', 'P'-'A'
    nxt_a = jnp.concatenate([a[:, 1:], jnp.full((R, 1), -1, a.dtype)], 1)
    nxt_member = jnp.concatenate([member[:, 1:],
                                  jnp.zeros((R, 1), bool)], 1)
    cleave_after = (member & ((a == K) | (a == Rc))
                    & nxt_member & (nxt_a != Pc))
    prev_member = jnp.concatenate([jnp.zeros((R, 1), bool),
                                   member[:, :-1]], 1)
    prev_cleave = jnp.concatenate([jnp.zeros((R, 1), bool),
                                   cleave_after[:, :-1]], 1)
    newfrag = member & (~prev_member | prev_cleave)
    frag_end = member & (~nxt_member | cleave_after)

    # FNV-1a scan with per-fragment resets (P unrolled vector steps)
    h1 = jnp.full((R,), _FNV_OFFSET, jnp.uint32)
    h2 = jnp.full((R,), _FNV_OFFSET2, jnp.uint32)
    ln = jnp.zeros((R,), jnp.int32)
    e1 = []
    e2 = []
    elen = []
    prime = jnp.uint32(_FNV_PRIME)
    for j in range(P):
        nf = newfrag[:, j]
        h1 = jnp.where(nf, jnp.uint32(_FNV_OFFSET), h1)
        h2 = jnp.where(nf, jnp.uint32(_FNV_OFFSET2), h2)
        ln = jnp.where(nf, 0, ln)
        m = member[:, j]
        c = a[:, j].astype(jnp.uint32)
        h1 = jnp.where(m, (h1 ^ c) * prime, h1)
        h2 = jnp.where(m, (h2 ^ (c + jnp.uint32(0x9E37))) * prime, h2)
        ln = jnp.where(m, ln + 1, ln)
        e1.append(h1)
        e2.append(h2)
        elen.append(ln)
    h1s = jnp.stack(e1, axis=1)  # (R, P)
    h2s = jnp.stack(e2, axis=1)
    lens = jnp.stack(elen, axis=1)
    emit = frag_end & (lens >= min_len) & (lens <= max_len)
    h1s = jnp.where(h1s == jnp.uint32(0xFFFFFFFF), jnp.uint32(0), h1s)

    # compact emitted fragments left (order-preserving slotkey sort)
    F = P // min_len + 1
    BIG = jnp.int32(np.iinfo(np.int32).max)
    slot = jnp.cumsum(emit.astype(jnp.int32), axis=1) - 1
    slotkey = jnp.where(emit, slot, BIG)
    sk, c1, c2 = jax.lax.sort(
        (slotkey, h1s.astype(jnp.int32), h2s.astype(jnp.int32)),
        dimension=-1, num_keys=1)
    sk = jax.lax.slice_in_dim(sk, 0, F, axis=-1)
    c1 = jax.lax.slice_in_dim(c1, 0, F, axis=-1)
    c2 = jax.lax.slice_in_dim(c2, 0, F, axis=-1)
    valid = sk != BIG
    return c1, c2, valid


def tryptic_pipeline_step(dna, lengths, dtax, dtable, config: PipelineConfig,
                          min_len: int = MIN_PEP, max_len: int = MAX_PEP,
                          euler=None, with_overflow: bool = False):
    """Fused self-contained tryptic pipeline: 6-frame translate ->
    device digest -> peptide-table probe (misses dropped, matching
    prot2tryp2lca without -o) -> uniq-merged taxa2agg. Mirrors
    pipeline.fused.pipeline_step but for the tryptic presets.

    ``with_overflow`` also returns a (B,) bool marking reads whose
    distinct hit taxa exceed ``config.k_max`` (the runner re-routes
    those through an exact wide program — never silent truncation)."""
    B, E, L = dna.shape
    table = encoding.get_table(config.table_number)
    aa, plens = translate.translate6_batch(
        dna.reshape(B * E, L), lengths.reshape(B * E), table)
    Rr, NF, P = aa.shape
    h1, h2, pvalid = tryptic_digest_device(
        aa.reshape(Rr * NF, P), plens.reshape(Rr * NF), min_len, max_len)
    F = h1.shape[-1]
    taxa, found = lookup.probe(dtable, h1, h2, valid=pvalid, default=0)
    hits = jnp.where(found & pvalid, taxa, 0).reshape(B, E * NF * F)
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


def make_tryptic_pipeline(dtax: devagg.DeviceTaxonomy,
                          dtable: lookup.DeviceTable,
                          config: PipelineConfig, max_peptides: int = 128):
    """Jitted (hi, lo, valid) -> per-read taxon (probe + taxa2agg).

    EXACT by construction: the per-read distinct-taxa capacity is the
    fragment width itself (distinct taxa <= valid fragments), so no
    k_max truncation/overflow machinery is needed on this path; jit
    retraces per width bucket (digest_groups buckets widths in powers
    of two)."""

    @jax.jit
    def step(hi, lo, valid, dtable, dtax):
        taxa, found = lookup.probe(dtable, hi, lo, valid=valid, default=0)
        hits = jnp.where(found, taxa, 0)
        utaxa, ucounts, uvalid = devagg.dedup_counts(
            hits, jnp.ones_like(hits, jnp.float32), hits.shape[-1])
        uvalid = devagg.filter_lower_bound(ucounts, uvalid, config.lower_bound)
        agg = devagg.aggregate_batch(
            dtax, utaxa, ucounts, uvalid, config.method, config.strategy,
            config.factor)
        snapped = devagg.snap_batch(dtax.snap_valid, agg, default=0)
        return jnp.where(uvalid.any(axis=-1), snapped, 1).astype(jnp.int32)

    return lambda hi, lo, valid: step(hi, lo, valid, dtable, dtax)


def make_tryptic_fused(dtax, dtable, config: PipelineConfig, euler=None,
                       wire: str = "codes", with_overflow: bool = False):
    """Jitted (dna, lengths) -> per-read taxon for the fused tryptic
    pipeline (the tryptic analogue of fused.make_pipeline, including
    the 4-bit packed wire)."""
    import functools

    if wire == "packed4":

        @functools.partial(jax.jit, static_argnames=("length",))
        def step_p(dna4, lengths, dtable, dtax, euler, length):
            dna = encoding.unpack_dna4_device(dna4, length)
            return tryptic_pipeline_step(dna, lengths, dtax, dtable, config,
                                         euler=euler,
                                         with_overflow=with_overflow)

        return lambda dna4, lengths, length: step_p(
            dna4, lengths, dtable, dtax, euler, length)

    @jax.jit
    def step(dna, lengths, dtable, dtax, euler):
        return tryptic_pipeline_step(dna, lengths, dtax, dtable, config,
                                     euler=euler, with_overflow=with_overflow)

    return lambda dna, lengths: step(dna, lengths, dtable, dtax, euler)


class TrypticAnalyser(Analyser):
    """Streaming tryptic analyser: same batching/pipelining/overflow
    machinery as the 9-mer :class:`~umgap_tpu.pipeline.runner.Analyser`,
    with the fused tryptic step (device digest + peptide-table probe)."""

    def _make_step(self, config: PipelineConfig, with_overflow: bool):
        return make_tryptic_fused(self.dtax, self.dtable, config,
                                  self._euler, wire="packed4",
                                  with_overflow=with_overflow)

    def _exact_kmax(self) -> int:
        # every digest fragment slot its own taxon: E ends x 6 frames x
        # (P // min_len + 1) fragment slots (see tryptic_digest_device)
        P = self.read_length // 3
        return self.ends * 6 * (P // MIN_PEP + 1)


def analyse_tryptic_device(groups, tax, table, config: PipelineConfig,
                           batch_size: int = 256, read_length: int = 160,
                           ends: int = 2):
    """Fully fused tryptic analysis: translate + digest + fingerprint +
    probe + aggregate in ONE device program per batch (the tryptic
    analogue of pipeline.runner; reads are clipped to ``read_length``
    like the 9-mer path). The host-digest path
    (:func:`analyse_tryptic_groups`) remains as the parity oracle."""
    analyser = TrypticAnalyser(tax, table, config, batch_size,
                               read_length, ends)
    return list(analyser.analyse_groups(groups))


def analyse_tryptic_groups(groups, tax, table, config: PipelineConfig,
                           batch_size: int = 256, max_peptides: int = 128,
                           dtax=None, dtable=None, step_cache=None):
    """Host digest + device probe/aggregate over read groups. Pass
    prebuilt ``dtax``/``dtable`` to reuse device state, and a
    ``step_cache`` dict so the jitted probe/agg program survives across
    samples/requests (a fresh jit closure per call would re-trace)."""
    dtax = dtax if dtax is not None else devagg.DeviceTaxonomy.from_host(tax)
    dtable = dtable if dtable is not None else \
        lookup.DeviceTable.from_host(table)
    step = step_cache.get(config) if step_cache is not None else None
    if step is None:
        step = make_tryptic_pipeline(dtax, dtable, config, max_peptides)
        if step_cache is not None:
            step_cache[config] = step
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
