"""Host-side streaming runner for the fused pipelines.

Reads FASTQ (paired or single), encodes into padded device batches,
runs the fused jitted pipeline, and emits the same per-read FASTA the
reference's analyse pipelines write (header stripped at the paired-end
delimiter, one consensus taxon per read)."""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..agg import device as devagg
from ..io import fasta, fastq
from ..ops import encoding, lookup
from ..taxonomy import Taxonomy
from ..utils import StageTimer, verbose
from .fused import PRESETS, PipelineConfig, make_pipeline


def encode_batch(groups: Sequence[Sequence[str]], ends: int, length: int):
    """Encode read groups into (B, E, L) codes + lengths (clipped)."""
    B = len(groups)
    dna = np.full((B, ends, length), encoding.DNA_N, dtype=np.uint8)
    lens = np.zeros((B, ends), dtype=np.int32)
    for i, group in enumerate(groups):
        for e, seq in enumerate(group[:ends]):
            codes = encoding.encode_dna(seq)[:length]
            dna[i, e, : len(codes)] = codes
            lens[i, e] = len(codes)
    return dna, lens


def read_groups_fastq(paths: Sequence[str], delimiter: str = "/"):
    """Yield (header, [sequences…]) groups from paired FASTQ files,
    header stripped at the delimiter (uniq -d semantics). Gzipped
    inputs are detected by magic bytes (umgap-analyse.sh:159-175)."""
    from ..configdir import sniff_open

    handles = [sniff_open(p) for p in paths]
    try:
        readers = [fastq.read_records(h) for h in handles]
        for group in fastq.interleave(readers):
            header = group[0].header
            idx = header.find(delimiter)
            if idx != -1:
                header = header[:idx]
            yield header, [rec.sequence for rec in group]
    finally:
        for h in handles:
            h.close()


class Analyser:
    """Holds device-resident state (taxonomy + index) across samples —
    the analogue of the reference's socket index service
    (/root/reference/src/commands/prot2kmer2lca.rs:116-137), except the
    'service' is just arrays living in HBM."""

    def __init__(self, tax: Taxonomy, table, config: PipelineConfig,
                 batch_size: int = 1024, read_length: int = 160, ends: int = 2):
        self.config = config
        self.batch_size = batch_size
        self.read_length = read_length
        self.ends = ends
        self.timer = StageTimer()
        with self.timer.stage("device_state_load"):
            self.dtax = devagg.DeviceTaxonomy.from_host(tax)
            self.dtable = lookup.DeviceTable.from_host(table)
            self._euler = None
            if (config.method, config.strategy) == ("rmq", "lca*"):
                from ..agg.device_rmq import DeviceEuler

                self._euler = DeviceEuler.from_host(tax)
        self.step = make_pipeline(self.dtax, self.dtable, config, self._euler,
                                  wire="packed4", with_overflow=True)
        self._wide_step = None  # built lazily on first k_max overflow
        self.overflow_reads = 0
        verbose(f"Analyser ready: preset={config.name} "
                f"batch={batch_size} ends={ends}")

    # -- k_max overflow fallback ---------------------------------------- #
    # config.k_max bounds the per-read distinct-taxa capacity of the fast
    # program (aggregation scales O(k_max^2)). Reads that exceed it are
    # rare; they are re-run through a program wide enough to be exact
    # (every window slot its own taxon), in small fixed batches.
    WIDE_BATCH = 64

    def _wide(self):
        if self._wide_step is None:
            frames = 6
            # >= windows per frame for any padded protein length
            w = max((self.read_length + 2) // 3, 1)
            exact = self.ends * frames * w
            cfg = self.config._replace(k_max=exact)
            self._wide_step = make_pipeline(
                self.dtax, self.dtable, cfg, self._euler, wire="packed4")
        return self._wide_step

    def _resolve_overflow(self, dna: np.ndarray, lens: np.ndarray,
                          taxa: np.ndarray, overflow: np.ndarray):
        """Re-run overflowed rows of one batch through the wide program
        and patch their results in place. dna: (B, E, L) uint8 codes."""
        idx = np.nonzero(overflow)[0]
        if not len(idx):
            return taxa
        self.overflow_reads += len(idx)
        wide = self._wide()
        W = self.WIDE_BATCH
        for s in range(0, len(idx), W):
            sel = idx[s : s + W]
            nd = dna[sel]
            nl = lens[sel]
            if len(sel) < W:
                nd = np.pad(nd, ((0, W - len(sel)), (0, 0), (0, 0)),
                            constant_values=encoding.DNA_N)
                nl = np.pad(nl, ((0, W - len(sel)), (0, 0)))
            out = np.asarray(wide(encoding.pack_dna4(nd), nl,
                                  self.read_length))
            taxa[sel] = out[: len(sel)]
        return taxa

    def analyse_groups(self, groups):
        """groups: iterable of (header, [seq…]). Yields (header, taxon)."""
        buf_headers: List[str] = []
        buf_seqs: List[Sequence[str]] = []
        for header, seqs in groups:
            buf_headers.append(header)
            buf_seqs.append(seqs)
            if len(buf_headers) == self.batch_size:
                yield from self._flush(buf_headers, buf_seqs)
                buf_headers, buf_seqs = [], []
        if buf_headers:
            yield from self._flush(buf_headers, buf_seqs)

    def _flush(self, headers, seqs):
        n = len(headers)
        # pad to full batch to avoid recompilation
        while len(seqs) < self.batch_size:
            seqs.append([""] * self.ends)
        dna, lens = encode_batch(seqs, self.ends, self.read_length)
        out, overflow = self.step(encoding.pack_dna4(dna), lens,
                                  self.read_length)
        taxa = self._resolve_overflow(dna, lens, np.array(out),
                                      np.asarray(overflow))
        for h, t in zip(headers, taxa[:n]):
            yield h, int(t)

    def analyse_arrays(self, headers, dna: np.ndarray, lens: np.ndarray,
                       depth: int = 2):
        """Pre-encoded groups: dna (N, E, L), lens (N, E).

        Keeps ``depth`` batches in flight so host encode/transfer
        overlaps device compute (the runtime is asynchronous; outputs
        are only materialized when popped)."""
        N = len(headers)
        B = self.batch_size
        inflight: List = []

        def emit(item):
            start, n, out = item
            with self.timer.stage("materialize"):
                taxa = np.array(out[0])
                overflow = np.asarray(out[1])
            if overflow.any():
                with self.timer.stage("overflow_fallback"):
                    nd = dna[start : start + B]
                    nl = lens[start : start + B]
                    pad = len(taxa) - len(nd)
                    if pad:
                        overflow = overflow[: len(nd)]
                    taxa = self._resolve_overflow(
                        np.ascontiguousarray(nd), np.ascontiguousarray(nl),
                        taxa[: len(nd)], overflow)
            for h, t in zip(headers[start : start + n], taxa[:n]):
                yield h, int(t)

        import jax

        def chunk(start):
            nd = dna[start : start + B]
            nl = lens[start : start + B]
            n = len(nd)
            if n < B:
                nd = np.pad(nd, ((0, B - n), (0, 0), (0, 0)),
                            constant_values=encoding.DNA_N)
                nl = np.pad(nl, ((0, B - n), (0, 0)))
            # 4-bit packed wire + async H2D so the halved transfer
            # overlaps the previous batch's device compute (transfers are
            # the end-to-end bottleneck on tunneled devices)
            return n, jax.device_put(encoding.pack_dna4(nd)), jax.device_put(nl)

        starts = list(range(0, N, B))
        pending = chunk(starts[0]) if starts else None
        for j, start in enumerate(starts):
            n, nd, nl = pending
            pending = chunk(starts[j + 1]) if j + 1 < len(starts) else None
            with self.timer.stage("dispatch"):
                inflight.append((start, n,
                                 self.step(nd, nl, self.read_length)))
            if len(inflight) > depth:
                yield from emit(inflight.pop(0))
        for item in inflight:
            yield from emit(item)
        verbose("analyse_arrays timings:\n" + self.timer.report())


def analyse_paired(fastq1: str, fastq2: str, tax: Taxonomy, table,
                   preset: str = "high-sensitivity", out=None,
                   batch_size: int = 256, read_length: int = 160,
                   use_native: bool = True):
    """Run a preset pipeline over a paired-end sample, writing per-read
    FASTA records (header, consensus taxon). Uses the native C++ parser
    when available (whole-file parse straight into padded code arrays)."""
    config = PRESETS[preset] if isinstance(preset, str) else preset
    analyser = Analyser(tax, table, config, batch_size, read_length, ends=2)
    results = None
    # Fall back to the Python parser only for EXPECTED conditions (the
    # toolchain is unavailable, or the input is gzipped — the native
    # parser reads raw files). Real parser bugs must fail loudly, not
    # silently degrade into a 10x slower path.
    native_ok = False
    if use_native:
        from ..io import native

        try:
            native_ok = native.ensure_built()
        except (OSError, RuntimeError):
            native_ok = False
        for p in (fastq1, fastq2):
            with open(p, "rb") as f:
                if f.read(2) == b"\x1f\x8b":
                    native_ok = False  # gzipped: python path decompresses
    if native_ok:
        h1, c1, l1 = native.parse_fastq_file(fastq1, read_length)
        h2, c2, l2 = native.parse_fastq_file(fastq2, read_length)
        n = min(len(h1), len(h2))  # Zip semantics: stop at shortest
        headers = []
        for h in h1[:n]:
            idx = h.find("/")
            headers.append(h[:idx] if idx != -1 else h)
        dna = np.stack([c1[:n], c2[:n]], axis=1)
        lens = np.stack([l1[:n], l2[:n]], axis=1)
        results = list(analyser.analyse_arrays(headers, dna, lens))
    if results is None:
        groups = read_groups_fastq([fastq1, fastq2])
        results = list(analyser.analyse_groups(groups))
    if out is not None:
        writer = fasta.Writer(out, "\n", False)
        for h, t in results:
            writer.write_record(fasta.Record(h, [str(t)]))
    return results


def analyse_stream(groups, tax: Taxonomy, table,
                   preset: str = "high-sensitivity", ends: int = 2,
                   batch_size: int = 256, read_length: int = 160):
    config = PRESETS[preset] if isinstance(preset, str) else preset
    analyser = Analyser(tax, table, config, batch_size, read_length, ends)
    return list(analyser.analyse_groups(groups))
