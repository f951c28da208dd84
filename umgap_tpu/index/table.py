"""Open-addressing hash tables for peptide -> taxon lookups.

The reference stores its index as an FST (string-keyed, prefix
compressed, pointer-chasing lookups — /root/reference/src/commands/
buildindex.rs:38-46, pept2lca.rs:74-79). Pointer chasing is hostile to
TPUs; instead we store fixed-width integer arrays in HBM and probe them
with vectorized gathers:

- ``KmerTable``: keys are fixed-length k-mers (k <= 10) packed into 45
  bits, split into two int32 lanes. Exact (no collisions possible:
  the full key is stored).
- ``PeptideTable``: keys are variable-length peptides fingerprinted with
  two independent 32-bit FNV-1a hashes (64-bit fingerprint). With n
  distinct keys the collision probability is ~n^2/2^65 (< 1e-4 even at
  100M keys); both lanes are stored and compared, so false hits require
  a full 64-bit collision.

Both use power-of-two capacity, linear probing, and record the maximum
probe distance at build time so device probe loops have a static-ish
bound. Misses return ``default`` (0 for the reference's `-o` mode,
src/commands/pept2lca.rs:47-50).

Serialization is a plain ``.npz`` — loads straight into numpy and then
into HBM with a single device_put per array.
"""

from __future__ import annotations

import numpy as np

from ..ops import encoding, kmers

EMPTY = np.int32(-1)

# xxhash/murmur-style 32-bit mixing constants
_C1 = np.uint32(0x9E3779B1)
_C2 = np.uint32(0x85EBCA77)
_C3 = np.uint32(0xC2B2AE3D)

_FNV_OFFSET = np.uint32(0x811C9DC5)
_FNV_PRIME = np.uint32(0x01000193)
_FNV_OFFSET2 = np.uint32(0xCBF29CE4)


def hash32(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """32-bit mix of the two key lanes (identical on host and device)."""
    h = (hi.astype(np.uint32) * _C1) ^ (lo.astype(np.uint32) * _C2)
    h ^= h >> np.uint32(16)
    h *= _C3
    h ^= h >> np.uint32(13)
    return h


def fingerprint_host(codes: np.ndarray) -> tuple[np.uint32, np.uint32]:
    """Two independent FNV-1a style hashes over AA codes (one peptide)."""
    h1 = _FNV_OFFSET
    h2 = _FNV_OFFSET2
    with np.errstate(over="ignore"):
        for c in codes.astype(np.uint32):
            h1 = (h1 ^ c) * _FNV_PRIME
            h2 = (h2 ^ (c + np.uint32(0x9E37))) * _FNV_PRIME
    return h1, h2


class _BaseTable:
    """Shared open-addressing machinery over (hi, lo) int32 key lanes."""

    kind = "base"

    def __init__(self, key_hi, key_lo, values, max_probes: int, n: int, meta=None):
        self.key_hi = key_hi
        self.key_lo = key_lo
        self.values = values
        self.max_probes = int(max_probes)
        self.n = int(n)
        self.meta = dict(meta or {})
        self.raw_keys = None
        self.raw_values = None

    @property
    def capacity(self) -> int:
        return len(self.values)

    # -- construction --------------------------------------------------- #

    @classmethod
    def _build(cls, hi: np.ndarray, lo: np.ndarray, values: np.ndarray,
               load_factor: float = 0.6, meta=None):
        n = len(values)
        cap = 64
        while cap * load_factor < max(n, 1):
            cap *= 2
        mask = np.uint32(cap - 1)
        key_hi = np.full(cap, EMPTY, dtype=np.int32)
        key_lo = np.full(cap, EMPTY, dtype=np.int32)
        vals = np.zeros(cap, dtype=np.int32)

        hi = hi.astype(np.int32)
        lo = lo.astype(np.int32)
        values = values.astype(np.int32)
        slot = (hash32(hi, lo) & mask).astype(np.int64)
        pending = np.arange(n)
        probes = np.zeros(n, dtype=np.int64)
        max_probes = 0
        while len(pending):
            s = slot[pending]
            # first key per candidate slot wins this round
            uniq, first_idx = np.unique(s, return_index=True)
            winners_mask = np.zeros(len(pending), dtype=bool)
            winners_mask[first_idx] = True
            # only place into genuinely empty slots
            empty = key_hi[s] == EMPTY
            place = winners_mask & empty
            idx = pending[place]
            key_hi[s[place]] = hi[idx]
            key_lo[s[place]] = lo[idx]
            vals[s[place]] = values[idx]
            # everyone else probes forward
            lose = ~place
            max_probes = max(max_probes, int(probes[pending].max(initial=0)))
            slot[pending[lose]] = (slot[pending[lose]] + 1) % cap
            probes[pending[lose]] += 1
            pending = pending[lose]
        max_probes = int(probes.max(initial=0))
        return cls(key_hi, key_lo, vals, max_probes, n, meta)

    # -- probing -------------------------------------------------------- #

    def probe_host(self, hi: np.ndarray, lo: np.ndarray,
                   default: int = 0) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized host probe. Returns (values, found_mask); missing
        entries get ``default``."""
        hi = np.asarray(hi, dtype=np.int32)
        lo = np.asarray(lo, dtype=np.int32)
        cap = self.capacity
        mask = np.uint32(cap - 1)
        slot = (hash32(hi, lo) & mask).astype(np.int64)
        out = np.full(hi.shape, default, dtype=np.int32)
        found = np.zeros(hi.shape, dtype=bool)
        live = np.ones(hi.shape, dtype=bool)
        for _ in range(self.max_probes + 1):
            if not live.any():
                break
            kh = self.key_hi[slot]
            kl = self.key_lo[slot]
            hit = live & (kh == hi) & (kl == lo)
            out[hit] = self.values[slot[hit]]
            found |= hit
            empty = kh == EMPTY
            live = live & ~hit & ~empty
            slot = (slot + 1) % cap
        return out, found

    # -- serialization -------------------------------------------------- #

    def save(self, path):
        extra = {}
        if getattr(self, "raw_keys", None) is not None:
            extra["raw_keys"] = np.frombuffer(
                "\n".join(self.raw_keys).encode(), dtype=np.uint8
            )
            extra["raw_values"] = self.raw_values
        np.savez_compressed(
            path,
            kind=np.bytes_(self.kind),
            key_hi=self.key_hi,
            key_lo=self.key_lo,
            values=self.values,
            max_probes=np.int64(self.max_probes),
            n=np.int64(self.n),
            **{f"meta_{k}": np.int64(v) for k, v in self.meta.items()},
            **extra,
        )

    @staticmethod
    def load(path):
        z = np.load(path, allow_pickle=False)
        kind = bytes(z["kind"]).decode() if "kind" in z else "kmer"
        meta = {
            k[len("meta_"):]: int(z[k]) for k in z.files if k.startswith("meta_")
        }
        cls = KmerTable if kind == "kmer" else PeptideTable
        t = cls(
            z["key_hi"], z["key_lo"], z["values"],
            int(z["max_probes"]), int(z["n"]), meta,
        )
        if "raw_keys" in z.files:
            blob = z["raw_keys"].tobytes().decode()
            t.raw_keys = blob.split("\n") if blob else []
            t.raw_values = z["raw_values"]
        return t


class KmerTable(_BaseTable):
    """Fixed-k packed-kmer table (exact)."""

    kind = "kmer"

    @classmethod
    def build(cls, packed: np.ndarray, values: np.ndarray, k: int,
              load_factor: float = 0.6) -> "KmerTable":
        hi, lo = kmers.split_packed(packed.astype(np.uint64))
        t = cls._build(hi, lo, values, load_factor, meta={"k": k})
        return t

    @property
    def k(self) -> int:
        return self.meta.get("k", kmers.DEFAULT_K)

    def lookup_host(self, peptides_codes: list[np.ndarray], default: int = 0):
        """Per-peptide k-mer lookups (host oracle)."""
        results = []
        for codes in peptides_codes:
            packed = kmers.pack_kmers_host(codes, self.k)
            hi, lo = kmers.split_packed(packed)
            vals, found = self.probe_host(hi, lo, default)
            results.append((vals, found))
        return results

    def items(self):
        """Iterate (packed_key, value) in slot order (for printindex)."""
        occ = np.nonzero(self.key_hi != EMPTY)[0]
        packed = kmers.join_packed(self.key_hi[occ], self.key_lo[occ])
        return packed, self.values[occ]


class PeptideTable(_BaseTable):
    """Variable-length peptide table keyed by 64-bit fingerprints.

    When ``store_keys`` (default), the original key strings are kept in
    the artifact so ``printindex`` can stream them back
    (the FST does this intrinsically; we store a newline-joined blob).
    """

    kind = "peptide"

    @classmethod
    def build(cls, peptides, values: np.ndarray,
              load_factor: float = 0.6, store_keys: bool = True) -> "PeptideTable":
        """``peptides``: iterable of AA strings (or code arrays)."""
        peptides = list(peptides)
        n = len(values)
        hi = np.zeros(n, dtype=np.int32)
        lo = np.zeros(n, dtype=np.int32)
        for i, p in enumerate(peptides):
            codes = encoding.encode_aa(p) if isinstance(p, (str, bytes)) else p
            h1, h2 = fingerprint_host(codes)
            hi[i] = np.int32(h1)
            lo[i] = np.int32(h2)
        t = cls._build(hi, lo, values, load_factor)
        if store_keys:
            t.raw_keys = [
                p if isinstance(p, str) else encoding.decode_aa(p) for p in peptides
            ]
            t.raw_values = np.asarray(values, dtype=np.int32)
        return t

    def lookup_peptides_host(self, peptides, default: int = 0):
        n = len(peptides)
        hi = np.zeros(n, dtype=np.int32)
        lo = np.zeros(n, dtype=np.int32)
        for i, p in enumerate(peptides):
            codes = encoding.encode_aa(p) if isinstance(p, (str, bytes)) else p
            h1, h2 = fingerprint_host(codes)
            hi[i] = np.int32(h1)
            lo[i] = np.int32(h2)
        return self.probe_host(hi, lo, default)
