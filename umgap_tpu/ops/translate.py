"""Six-frame translation.

Host path mirrors the reference command exactly
(/root/reference/src/commands/translate.rs); the device path is the
TPU-native form: a whole batch of padded DNA code tensors is translated
in all six frames with pure gathers from a 125-entry codon table —
no per-read control flow, fully fused under jit.

Frame naming follows the reference: "1","2","3" forward (1-indexed
offset), "1R","2R","3R" on the reverse-complement strand
(src/commands/translate.rs:143-183).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import encoding
from .encoding import TranslationTable

FRAME_NAMES = ("1", "2", "3", "1R", "2R", "3R")


# ---------------------------------------------------------------------- #
# Host (parity oracle / CLI path)
# ---------------------------------------------------------------------- #

def translate_sequence(
    seq: str, frames: Sequence[str], table: TranslationTable, methionine: bool = False
) -> List[str]:
    """Translate one DNA string in the given frames, returning AA strings
    ('-' for unknown codons), in frame order."""
    codes = encoding.encode_dna(seq)
    rev = encoding.DNA_COMPLEMENT[codes[::-1]]
    out = []
    for frame in frames:
        reversed_ = frame.endswith("R")
        offset = int(frame[0]) - 1
        strand = rev if reversed_ else codes
        sub = strand[offset:] if len(strand) > offset else strand[:0]
        out.append(encoding.decode_aa(table.translate_frame(sub, methionine)))
    return out


# ---------------------------------------------------------------------- #
# Device (batched, jittable)
# ---------------------------------------------------------------------- #

def translate6_batch(dna: jax.Array, lengths: jax.Array, table: TranslationTable,
                     methionine: bool = False):
    """Translate a padded batch in all six frames.

    Args:
      dna: (B, L) uint8 DNA codes (padding value irrelevant; masked out).
      lengths: (B,) int32 actual read lengths.
      table: genetic code.

    Returns:
      aa: (B, 6, P) uint8 AA codes with P = L // 3; positions beyond the
        frame's peptide length are AA_PAD.
      pep_lengths: (B, 6) int32 number of codons per frame.
    """
    B, L = dna.shape
    P = L // 3
    lengths = lengths.astype(jnp.int32)

    aa_tab = jnp.asarray(table.aa, dtype=jnp.uint8)
    start_tab = jnp.asarray(table.start)
    comp = jnp.asarray(encoding.DNA_COMPLEMENT, dtype=jnp.uint8)

    # Reverse-complement with per-read length: rc[i] = comp(dna[len-1-i]).
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]  # (1, L)
    rc_idx = jnp.clip(lengths[:, None] - 1 - pos, 0, L - 1)
    rc = comp[jnp.take_along_axis(dna, rc_idx, axis=1)]
    rc = jnp.where(pos < lengths[:, None], rc, jnp.uint8(encoding.DNA_N))
    fwd = dna

    # codon start positions per frame offset f: f, f+3, ...
    p = jnp.arange(P, dtype=jnp.int32)

    def frame_translate(strand, offset):
        starts = offset + 3 * p  # (P,)
        idx0 = jnp.clip(starts, 0, L - 1)
        idx1 = jnp.clip(starts + 1, 0, L - 1)
        idx2 = jnp.clip(starts + 2, 0, L - 1)
        c0 = jnp.take(strand, idx0, axis=1).astype(jnp.int32)
        c1 = jnp.take(strand, idx1, axis=1).astype(jnp.int32)
        c2 = jnp.take(strand, idx2, axis=1).astype(jnp.int32)
        codon = c0 * 25 + c1 * 5 + c2
        aa = aa_tab[codon]
        if methionine:
            aa = jnp.where(start_tab[codon], jnp.uint8(encoding.AA_FROM_BYTE[ord("M")]), aa)
        ncod = jnp.maximum(lengths - offset, 0) // 3  # (B,)
        valid = p[None, :] < ncod[:, None]
        aa = jnp.where(valid, aa, jnp.uint8(encoding.AA_PAD))
        return aa, ncod

    frames = []
    plens = []
    for offset in range(3):
        aa, n = frame_translate(fwd, offset)
        frames.append(aa)
        plens.append(n)
    for offset in range(3):
        aa, n = frame_translate(rc, offset)
        frames.append(aa)
        plens.append(n)
    return jnp.stack(frames, axis=1), jnp.stack(plens, axis=1)
