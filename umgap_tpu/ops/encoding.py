"""Integer encodings for DNA, amino acids, and codons.

TPU-first redesign of the reference's char-based processing
(/root/reference/src/dna/mod.rs, src/dna/translation.rs): reads become
``uint8`` code tensors, translation becomes a 125-entry table gather, and
peptides use a 5-bit alphabet so a 9-mer packs into 45 bits (split 20/25
over two int32 lanes for TPU-friendly integer math).

DNA codes: A=0 C=1 G=2 T=3, anything else N=4 (src/dna/mod.rs:34-44).
AA codes: 'A'..'Z' -> 0..25, '*' -> 26, '-' (untranslatable) and any
other byte -> 27. 31 is reserved as "no symbol" padding.

The 23 NCBI genetic code tables are public standard data; the table
strings below are indexed by codon in T,C,A,G base order exactly as NCBI
publishes them (and as the reference embeds them,
src/dna/translation.rs:47-104).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------- #
# DNA
# ---------------------------------------------------------------------- #

DNA_A, DNA_C, DNA_G, DNA_T, DNA_N = 0, 1, 2, 3, 4

DNA_FROM_BYTE = np.full(256, DNA_N, dtype=np.uint8)
for _ch, _code in zip(b"ACGT", (DNA_A, DNA_C, DNA_G, DNA_T)):
    DNA_FROM_BYTE[_ch] = _code
BYTE_FROM_DNA = np.frombuffer(b"ACGTN", dtype=np.uint8).copy()

# complement: A<->T, C<->G, N->N
DNA_COMPLEMENT = np.array([DNA_T, DNA_G, DNA_C, DNA_A, DNA_N], dtype=np.uint8)


def encode_dna(seq: str | bytes) -> np.ndarray:
    if isinstance(seq, str):
        seq = seq.encode()
    return DNA_FROM_BYTE[np.frombuffer(seq, dtype=np.uint8)]


def pack_dna4(codes: np.ndarray) -> np.ndarray:
    """Pack DNA codes (values 0..4) two-per-byte along the last axis —
    the host->device wire format (halves transfer bytes; the tunnel link
    to the device is the end-to-end bottleneck). Odd lengths pad with N.
    """
    if codes.shape[-1] % 2:
        pad = [(0, 0)] * (codes.ndim - 1) + [(0, 1)]
        codes = np.pad(codes, pad, constant_values=DNA_N)
    even = codes[..., 0::2].astype(np.uint8)
    odd = codes[..., 1::2].astype(np.uint8)
    return (even << 4) | odd


def unpack_dna4_device(packed, length: int):
    """Device-side inverse of :func:`pack_dna4` (jittable)."""
    import jax.numpy as jnp

    p = jnp.asarray(packed)
    even = (p >> 4) & 0xF
    odd = p & 0xF
    out = jnp.stack([even, odd], axis=-1).reshape(p.shape[:-1] + (-1,))
    return out[..., :length].astype(jnp.uint8)


def decode_dna(codes: np.ndarray) -> str:
    return BYTE_FROM_DNA[codes].tobytes().decode()


# ---------------------------------------------------------------------- #
# Amino acids (5-bit alphabet)
# ---------------------------------------------------------------------- #

AA_STOP = 26  # '*'
AA_UNKNOWN = 27  # '-' and any unsupported byte
AA_PAD = 31  # padding / no symbol

AA_FROM_BYTE = np.full(256, AA_UNKNOWN, dtype=np.uint8)
for _i in range(26):
    AA_FROM_BYTE[ord("A") + _i] = _i
AA_FROM_BYTE[ord("*")] = AA_STOP

_AA_DECODE = [chr(ord("A") + i) for i in range(26)] + ["*", "-", "?", "?", "?", ""]
BYTE_FROM_AA = np.frombuffer(
    ("".join(_AA_DECODE[:31]) + "\x00").encode(), dtype=np.uint8
).copy()


def encode_aa(seq: str | bytes) -> np.ndarray:
    if isinstance(seq, str):
        seq = seq.encode()
    return AA_FROM_BYTE[np.frombuffer(seq, dtype=np.uint8)]


def decode_aa(codes: np.ndarray) -> str:
    return "".join(_AA_DECODE[int(c)] for c in codes)


# ---------------------------------------------------------------------- #
# Genetic code tables (NCBI standard data, T,C,A,G codon order)
# ---------------------------------------------------------------------- #

# number -> (name, amino acids, start codons)
GENETIC_CODES: dict[int, tuple[str, str, str]] = {
    1: ("universal",
        "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
        "---M---------------M---------------M----------------------------"),
    2: ("vertebrate_mitochondrial",
        "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIMMTTTTNNKKSS**VVVVAAAADDEEGGGG",
        "--------------------------------MMMM---------------M------------"),
    3: ("yeast_mitochondrial",
        "FFLLSSSSYY**CCWWTTTTPPPPHHQQRRRRIIMMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
        "----------------------------------MM----------------------------"),
    4: ("mold_mitochondrial",
        "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
        "--MM---------------M------------MMMM---------------M------------"),
    5: ("invertebrate_mitochondrial",
        "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIMMTTTTNNKKSSSSVVVVAAAADDEEGGGG",
        "---M----------------------------MMMM---------------M------------"),
    6: ("ciliate_nuclear",
        "FFLLSSSSYYQQCC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
        "-----------------------------------M----------------------------"),
    9: ("echinoderm_mitochondrial",
        "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIIMTTTTNNNKSSSSVVVVAAAADDEEGGGG",
        "-----------------------------------M---------------M------------"),
    10: ("euplotid_nuclear",
         "FFLLSSSSYY**CCCWLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
         "-----------------------------------M----------------------------"),
    11: ("bacterial",
         "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
         "---M---------------M------------MMMM---------------M------------"),
    12: ("alternative_yeast_nuclear",
         "FFLLSSSSYY**CC*WLLLSPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
         "-------------------M---------------M----------------------------"),
    13: ("ascidian_mitochondrial",
         "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIMMTTTTNNKKSSGGVVVVAAAADDEEGGGG",
         "---M------------------------------MM---------------M------------"),
    14: ("flatworm_mitochondrial",
         "FFLLSSSSYYY*CCWWLLLLPPPPHHQQRRRRIIIMTTTTNNNKSSSSVVVVAAAADDEEGGGG",
         "-----------------------------------M----------------------------"),
    15: ("blepharisma_macronuclear",
         "FFLLSSSSYY*QCC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
         "-----------------------------------M----------------------------"),
    16: ("chlorophycean_mitochondrial",
         "FFLLSSSSYY*LCC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
         "-----------------------------------M----------------------------"),
    21: ("trematode_mitochondrial",
         "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIMMTTTTNNNKSSSSVVVVAAAADDEEGGGG",
         "-----------------------------------M---------------M------------"),
    22: ("scenedesmus_mitochondrial",
         "FFLLSS*SYY*LCC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
         "-----------------------------------M----------------------------"),
    23: ("thraustochytrium_mitochondrial",
         "FF*LSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
         "--------------------------------M--M---------------M------------"),
}

# Codon order in the table strings is T,C,A,G; map our A/C/G/T codes to
# that base order.
_TCAG_FROM_DNA = np.array([2, 1, 3, 0], dtype=np.int64)  # A->2, C->1, G->3, T->0


class TranslationTable:
    """One genetic code as gather tables over 5x5x5 codon codes.

    ``aa[codon]`` is the AA code for a codon index ``n0*25 + n1*5 + n2``
    (our DNA codes); any codon containing N maps to AA_UNKNOWN
    (reference: absent from the codon HashMap -> b'-',
    src/dna/translation.rs:125-132). ``start[codon]`` marks start codons.
    """

    def __init__(self, number: int):
        if number not in GENETIC_CODES:
            raise ValueError(f"Unknown table: {number}")
        self.number = number
        name, aas, starts = GENETIC_CODES[number]
        self.name = name
        self.aas = aas
        self.starts = starts
        aa = np.full(125, AA_UNKNOWN, dtype=np.uint8)
        start = np.zeros(125, dtype=bool)
        for idx in range(64):
            t0, t1, t2 = idx // 16, (idx // 4) % 4, idx % 4
            # invert the TCAG ordering back to our DNA codes
            codes = [int(np.where(_TCAG_FROM_DNA == t)[0][0]) for t in (t0, t1, t2)]
            codon = codes[0] * 25 + codes[1] * 5 + codes[2]
            aa[codon] = AA_FROM_BYTE[ord(aas[idx])]
            start[codon] = starts[idx] == "M"
        self.aa = aa
        self.start = start

    def translate_frame(self, dna_codes: np.ndarray, methionine: bool = False) -> np.ndarray:
        """Host translation of one frame (codons = chunks of 3, trailing
        partial codon dropped; src/dna/translation.rs:136-144)."""
        n = (len(dna_codes) // 3) * 3
        c = dna_codes[:n].reshape(-1, 3).astype(np.int64)
        idx = c[:, 0] * 25 + c[:, 1] * 5 + c[:, 2]
        out = self.aa[idx]
        if methionine:
            out = np.where(self.start[idx], AA_FROM_BYTE[ord("M")], out)
        return out

    def show(self) -> str:
        """Human-readable table (reference TranslationTable::print,
        src/dna/translation.rs:147-174)."""
        lines = [f"{self.name}={self.number}"]
        base = "TCAG"
        rows = {
            "AAs": self.aas,
            "Starts": self.starts,
            "Base1": "".join(base[i // 16] for i in range(64)),
            "Base2": "".join(base[(i // 4) % 4] for i in range(64)),
            "Base3": "".join(base[i % 4] for i in range(64)),
        }
        for name, row in rows.items():
            lines.append(f"{name:<6} = {row}")
        return "\n".join(lines)


_TABLE_CACHE: dict[int, TranslationTable] = {}


def get_table(number: int) -> TranslationTable:
    if number not in _TABLE_CACHE:
        _TABLE_CACHE[number] = TranslationTable(number)
    return _TABLE_CACHE[number]
