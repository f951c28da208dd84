"""Independent parity oracle: a literal Python transliteration of the
reference (unipept/umgap v1.1.1, Rust, at /root/reference).

Purpose
-------
No Rust toolchain exists in this image and there is no network egress, so
the reference binary cannot be built or run (see PARITY.md). This module
is the substitute oracle: a *separate, deliberately line-faithful*
re-implementation of the reference's algorithms and command semantics,
written directly from the Rust sources, sharing **zero code** with the
``umgap_tpu`` package. Golden outputs under ``tests/golden/`` are
generated from this oracle and byte-compared against the ``umgap_tpu``
CLI in ``tests/test_golden.py``.

Fidelity notes (every known divergence from the Rust, pinned)
-------------------------------------------------------------
The reference is nondeterministic wherever it iterates a Rust ``HashMap``
or ``HashSet`` (its own tests admit this, src/rmq/rtl.rs:89-92). This
oracle pins those sites to the same deterministic choices the
``umgap_tpu`` package documents (umgap_tpu/agg/host.py:8-15):

* ``agg::count`` (src/agg/mod.rs:27-36): f32 accumulation, first-seen
  (input) order.
* rmq::lca aggregate walk (src/rmq/lca.rs:65): iterates taxa in
  ascending taxon-id order instead of HashMap order.
* rmq::rtl / rmq::mix argmax (src/rmq/rtl.rs:52-56, src/rmq/mix.rs:88-92):
  ties broken by greater depth, then smaller taxon id (Rust: HashMap
  iteration order, nondeterministic).
* tree::mix child descent (src/tree/mix.rs:53-57): ``max_by_key`` over
  children in a HashSet; ties pinned to the smallest child taxon id.
* taxa2freq row order (src/commands/taxa2freq.rs:131-135): descending
  total; ties pinned to ascending taxon id.

Everything else is deterministic in the reference and transliterated
exactly, including: the 64-bit-block RMQ with its positional tie
behavior (src/rmq/mod.rs), the Euler tour child order (input file
order, src/taxon.rs:224-247), ``bestof``'s dropped final record
(src/commands/bestof.rs:57-76), the degenerate ``Rank::score`` cascade
(src/rank.rs:86-99: every rank above species scores 12, species and
below score None), FASTA writer newline quirks (src/io/fasta.rs:159-181),
the seedextend state machine (src/commands/seedextend.rs:101-177), and
Rust ``max_by_key`` keeping the *last* maximum / ``min_by_key`` keeping
the *first* minimum.
"""

from __future__ import annotations

import re
from collections import deque
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

f32 = np.float32

# ---------------------------------------------------------------------- #
# rank (src/rank.rs)
# ---------------------------------------------------------------------- #

RANK_NAMES = [
    "no rank", "superkingdom", "domain", "realm", "kingdom", "subkingdom",
    "superphylum", "phylum", "subphylum", "superclass", "class", "subclass",
    "infraclass", "superorder", "order", "suborder", "infraorder",
    "parvorder", "superfamily", "family", "subfamily", "tribe", "subtribe",
    "genus", "subgenus", "species group", "species subgroup", "species",
    "subspecies", "varietas", "forma", "strain",
]
RANK_COUNT = 32
NO_RANK = 0
_RANK_BY_NAME = {n: i for i, n in enumerate(RANK_NAMES)}
_SPECIES = _RANK_BY_NAME["species"]


def parse_rank(name: str) -> int:
    if name not in _RANK_BY_NAME:
        raise OracleError(f"Matching variant not found: {name}")
    return _RANK_BY_NAME[name]


def rank_score(rank: int) -> Optional[int]:
    """src/rank.rs:86-99 — realized semantics: the first branch
    (``self < Species`` => 12) subsumes all later ones, so any named rank
    above species scores 12; NoRank (incomparable) and species-and-below
    fall through to None."""
    if NO_RANK < rank < _SPECIES:
        return 12
    return None


# ---------------------------------------------------------------------- #
# taxon (src/taxon.rs)
# ---------------------------------------------------------------------- #


class OracleError(Exception):
    pass


class Taxon:
    __slots__ = ("id", "name", "rank", "parent", "valid")

    def __init__(self, tid: int, name: str, rank: int, parent: int, valid: bool):
        self.id = tid
        self.name = name
        self.rank = rank
        self.parent = parent
        self.valid = valid


def parse_taxon_line(line: str) -> Taxon:
    """src/taxon.rs:89-113 — 5 tab-separated fields; valid byte \\x01/\\x00."""
    split = line.rstrip().split("\t")
    if len(split) != 5:
        raise OracleError("Taxon requires five fields")
    tid = int(split[0])
    rank = parse_rank(split[2])
    parent = int(split[3])
    if split[4] == "\x01":
        valid = True
    elif split[4] == "\x00":
        valid = False
    else:
        raise OracleError("Couldn't parse the valid byte")
    return Taxon(tid, split[1], rank, parent, valid)


def read_taxa(text: str) -> List[Taxon]:
    """src/taxon.rs:119-128."""
    return [parse_taxon_line(l) for l in _rust_lines(text)]


class TaxonList:
    """src/taxon.rs:131-210 — dense Option<Taxon> vector by id."""

    def __init__(self, taxa: List[Taxon], with_unknown: bool = False):
        max_id = max((t.id for t in taxa), default=0)
        self.by_id: List[Optional[Taxon]] = [None] * (max_id + 1)
        for t in taxa:
            self.by_id[t.id] = t
        if with_unknown and self.by_id[0] is None:
            self.by_id[0] = Taxon(0, "unknown", NO_RANK, 0, False)

    def get(self, tid: int) -> Optional[Taxon]:
        if 0 <= tid < len(self.by_id):
            return self.by_id[tid]
        return None

    def get_or_unknown(self, tid: int) -> Taxon:
        t = self.get(tid)
        if t is None:
            raise OracleError(f"Unknown Taxon ID: {tid}")
        return t

    def ancestry(self) -> List[Optional[int]]:
        return [t.parent if t is not None else None for t in self.by_id]

    def score(self, tid: int) -> Optional[int]:
        """src/taxon.rs:181-191 — walk up to the first self-parent or
        ranked taxon and return its rank score."""
        current = tid
        while True:
            t = self.get(current)
            if t is None:
                return None
            if t.parent == current or t.rank != NO_RANK:
                return rank_score(t.rank)
            current = t.parent

    def lineage(self, tid: int) -> List[Optional[Taxon]]:
        """src/taxon.rs:194-209 — per-rank array of ancestors."""
        arr: List[Optional[Taxon]] = [None] * RANK_COUNT
        next_id: Optional[int] = tid
        prev_id: Optional[int] = None
        while next_id != prev_id:
            taxon = self.get_or_unknown(next_id)
            if taxon.rank != NO_RANK:
                arr[taxon.rank] = taxon
            prev_id = next_id
            next_id = taxon.parent
        return arr


class TaxonTree:
    """src/taxon.rs:214-302 — children map in input order; single root."""

    def __init__(self, taxa: List[Taxon]):
        self.children: Dict[int, List[int]] = {}
        self.max = taxa[0].id
        roots = {t.id for t in taxa}
        for t in taxa:
            if t.id > self.max:
                self.max = t.id
            if t.id == t.parent:
                continue
            self.children.setdefault(t.parent, []).append(t.id)
            roots.discard(t.id)
        if len(roots) > 1:
            raise OracleError("More than one root!")
        if not roots:
            raise OracleError("There's no root!")
        self.root = next(iter(roots))

    def child_count(self, tid: int) -> int:
        return len(self.children.get(tid, ()))

    def filter_ancestors(self, pred) -> List[Optional[int]]:
        """src/taxon.rs:251-281 — DFS carrying nearest matching ancestor;
        the root is its own ancestor even when it fails the filter."""
        ancestors: List[Optional[int]] = [None] * (self.max + 1)
        stack: List[Tuple[int, Optional[int]]] = [(self.root, self.root)]
        while stack:
            current, ancestor = stack.pop()
            if pred(current):
                ancestor = current
            ancestors[current] = ancestor
            for child in self.children.get(current, ()):
                stack.append((child, ancestor))
        return ancestors

    def snapping(self, by_id: TaxonList, ranked_only: bool) -> List[Optional[int]]:
        def pred(i: int) -> bool:
            t = by_id.get(i)
            return t is not None and t.valid and (not ranked_only or t.rank != NO_RANK)

        return self.filter_ancestors(pred)

    def euler_tour(self) -> List[Tuple[int, int]]:
        """src/taxon.rs:309-392 — (taxon, depth) pairs: a parent appears
        before each child subtree and once after the last."""
        out: List[Tuple[int, int]] = []

        def visit(node: int, depth: int):
            out.append((node, depth))
            for child in self.children.get(node, ()):
                visit(child, depth + 1)
                out.append((node, depth))

        import sys

        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 4 * (self.max.bit_length() + 64) + 10000))
        try:
            visit(self.root, 0)
        finally:
            sys.setrecursionlimit(old)
        return out


# ---------------------------------------------------------------------- #
# agg helpers (src/agg/mod.rs)
# ---------------------------------------------------------------------- #


def agg_count(pairs) -> Dict[int, np.float32]:
    """src/agg/mod.rs:27-36 — f32 accumulation; dict pins first-seen order."""
    counts: Dict[int, np.float32] = {}
    for tid, c in pairs:
        counts[tid] = f32(counts.get(tid, f32(0.0)) + f32(c))
    return counts


def agg_filter(counts: Dict[int, np.float32], lower_bound: float) -> Dict[int, np.float32]:
    """src/agg/mod.rs:39-44 — keep freq >= lower_bound."""
    lb = f32(lower_bound)
    return {t: c for t, c in counts.items() if c >= lb}


class EmptyInput(OracleError):
    def __init__(self):
        super().__init__("Aggregration called on an empty list")


# ---------------------------------------------------------------------- #
# RMQ (src/rmq/mod.rs) — exact 64-bit-block transliteration
# ---------------------------------------------------------------------- #

_SIZE = 64  # bits in a usize on this platform
_LOG2SIZE = 6


def _intlog2(n: int) -> int:
    return n.bit_length() - 1


def _clearbits(n: int, x: int) -> int:
    return (n >> x) << x


class RMQ:
    def __init__(self, array: Sequence[int]):
        self.array = list(array)
        self.block_min = self._block_min(self.array)
        self.sparse = self._sparse(self.array, self.block_min)
        self.labels = self._labels(self.array)

    @staticmethod
    def _block_min(array: List[int]) -> List[int]:
        # min_by_key keeps the FIRST minimum in each 64-element block.
        out = []
        for bi in range(0, len(array), _SIZE):
            block = array[bi : bi + _SIZE]
            best = 0
            for j in range(1, len(block)):
                if block[j] < block[best]:
                    best = j
            out.append(best + bi)
        return out

    @staticmethod
    def _aggregate_minima(array: List[int], shift: int, minima: List[int]) -> List[int]:
        return [
            l if array[l] < array[r] else r
            for l, r in zip(minima, minima[shift:])
        ]

    @classmethod
    def _sparse(cls, array: List[int], block_min: List[int]) -> List[List[int]]:
        length = _intlog2(len(block_min)) if block_min else 0
        sparse: List[List[int]] = []
        if length >= 0 and block_min:
            sparse.append(cls._aggregate_minima(array, 1, block_min))
            for i in range(1, length):
                sparse.append(cls._aggregate_minima(array, 1 << i, sparse[i - 1]))
        return sparse

    @staticmethod
    def _labels(array: List[int]) -> List[int]:
        gstack: List[int] = []
        labels: List[int] = []
        for i in range(len(array)):
            if i % _SIZE == 0:
                gstack.clear()
            labels.append(0)
            while gstack and array[i] < array[gstack[-1]]:
                gstack.pop()
            if gstack:
                g = gstack[-1]
                labels[i] = labels[g] | (1 << (g % _SIZE))
            gstack.append(i)
        return labels

    def _min_in_block(self, left: int, right: int) -> int:
        v = _clearbits(self.labels[right], left % _SIZE)
        if v == 0:
            return right
        return _clearbits(left, _LOG2SIZE) + ((v & -v).bit_length() - 1)

    def query(self, start: int, end: int) -> int:
        if start == end:
            return start
        left, right = (start, end) if start < end else (end, start)
        block_diff = (right >> _LOG2SIZE) - (left >> _LOG2SIZE)
        if block_diff == 0:
            return self._min_in_block(left, right)
        l = self._min_in_block(left, _clearbits(left, _LOG2SIZE) + _SIZE - 1)
        r = self._min_in_block(_clearbits(right, _LOG2SIZE), right)
        if block_diff == 1:
            return l if self.array[l] <= self.array[r] else r
        if block_diff == 2:
            m = self.block_min[(left >> _LOG2SIZE) + 1]
        else:
            k = _intlog2(block_diff - 1) - 1
            t1 = self.sparse[k][(left >> _LOG2SIZE) + 1]
            t2 = self.sparse[k][(right >> _LOG2SIZE) - (1 << (k + 1))]
            m = t1 if self.array[t1] <= self.array[t2] else t2
        ex = l if self.array[l] <= self.array[m] else m
        return ex if self.array[ex] <= self.array[r] else r


# ---------------------------------------------------------------------- #
# aggregators (src/rmq/{lca,rtl,mix}.rs, src/tree/{mod,lca,mix}.rs)
# ---------------------------------------------------------------------- #


class RmqLCACalculator:
    """src/rmq/lca.rs — Euler tour + RMQ over depths."""

    def __init__(self, tree: TaxonTree):
        self.euler: List[int] = []
        depths: List[int] = []
        self.first: Dict[int, int] = {}
        for i, (tid, depth) in enumerate(tree.euler_tour()):
            self.euler.append(tid)
            depths.append(depth)
            self.first.setdefault(tid, i)
        self.rmq = RMQ(depths)

    def _first_occ(self, tid: int) -> int:
        if tid not in self.first:
            raise OracleError(f"Unknown Taxon ID: {tid}")
        return self.first[tid]

    def lca(self, left: int, right: int) -> int:
        return self.euler[self.rmq.query(self._first_occ(left), self._first_occ(right))]

    def aggregate(self, counts: Dict[int, np.float32]) -> int:
        """src/rmq/lca.rs:60-90 join-level walk. Rust iterates HashMap
        order; pinned to ascending taxon id (see module docstring)."""
        if not counts:
            raise EmptyInput()
        indices = [self._first_occ(t) for t in sorted(counts.keys())]
        consensus = indices[0]
        join_level: Optional[int] = None
        for nxt in indices[1:]:
            if consensus == nxt:
                continue
            rmq = self.rmq.query(consensus, nxt)
            if rmq != consensus and rmq != nxt:
                lca, level = rmq, self.rmq.array[rmq]
            elif rmq == consensus:
                lca, level = nxt, join_level
            else:
                lca, level = consensus, join_level
            if join_level is not None and self.rmq.array[lca] > join_level:
                lca = rmq
            consensus = lca
            join_level = level
        return self.euler[consensus]


def _argmax_pinned(entries: List[Tuple[int, np.float32]], depth_of) -> int:
    """Argmax over (taxon, score): max score, ties by greater depth then
    smaller id (pinning Rust's nondeterministic HashMap argmax)."""
    best_score = max(s for _, s in entries)
    cand = [t for t, s in entries if s == best_score]
    dmax = max(depth_of(t) for t in cand)
    return min(t for t in cand if depth_of(t) == dmax)


class RTLCalculator:
    """src/rmq/rtl.rs — MRTL."""

    def __init__(self, root: int, by_id: TaxonList):
        self.root = root
        self.ancestors = by_id.ancestry()
        self.ancestors[root] = None
        self._by_id = by_id

    def _depth(self, tid: int) -> int:
        d, cur = 0, tid
        while self.ancestors[cur] is not None:
            cur = self.ancestors[cur]
            d += 1
        return d

    def aggregate(self, counts: Dict[int, np.float32]) -> int:
        if not counts:
            raise EmptyInput()
        rtl: List[Tuple[int, np.float32]] = []
        for taxon, c in counts.items():
            total = f32(c)
            nxt = taxon
            if not (0 <= nxt < len(self.ancestors)):
                raise OracleError(f"Unknown Taxon ID: {nxt}")
            while self.ancestors[nxt] is not None:
                anc = self.ancestors[nxt]
                total = f32(total + f32(counts.get(anc, f32(0.0))))
                nxt = anc
            if nxt != self.root:
                raise OracleError(f"Unknown Taxon ID: {nxt}")
            rtl.append((taxon, total))
        return _argmax_pinned(rtl, self._depth)


class RmqMixCalculator:
    """src/rmq/mix.rs — LCA/MRTL hybrid over the pairwise-LCA closure."""

    def __init__(self, tree: TaxonTree, factor: float):
        self.lca_calc = RmqLCACalculator(tree)
        self.factor = f32(factor)

    def aggregate(self, counts: Dict[int, np.float32]) -> int:
        if not counts:
            raise EmptyInput()
        weights: Dict[int, Tuple[np.float32, np.float32]] = {}
        queue = deque(counts.keys())
        while queue:
            left = queue.popleft()
            if left in weights:
                continue
            for right, c in counts.items():
                lca = self.lca_calc.lca(left, right)
                if lca == left or lca == right:
                    wl, wr = weights.setdefault(left, (f32(0.0), f32(0.0)))
                    if lca == left:
                        wl = f32(wl + f32(c))
                    if lca == right:
                        wr = f32(wr + f32(c))
                    weights[left] = (wl, wr)
                else:
                    queue.append(lca)
        if not weights:
            raise EmptyInput()
        fac = self.factor
        entries = [
            (t, f32(wl * fac + wr * f32(f32(1.0) - fac)))
            for t, (wl, wr) in weights.items()
        ]

        def depth_of(t: int) -> int:
            return self.lca_calc.rmq.array[self.lca_calc.first[t]]

        return _argmax_pinned(entries, depth_of)


class _Node:
    """src/tree/mod.rs Tree<T>."""

    __slots__ = ("root", "value", "children")

    def __init__(self, root: int, value: np.float32, children: List["_Node"]):
        self.root = root
        self.value = value
        self.children = children


def _build_tree(root: int, parents: List[Optional[int]], taxons: Dict[int, np.float32]) -> _Node:
    """src/tree/mod.rs:29-67 — BFS up the parent links; children built
    from a HashSet in Rust (nondeterministic order) — pinned to
    ascending id here."""
    edges: Dict[int, set] = {}
    queue = deque(taxons.keys())
    enqueued = set()
    while queue:
        tid = queue.popleft()
        if not (0 <= tid < len(parents)) or parents[tid] is None:
            raise OracleError(f"Unknown Taxon ID: {tid}")
        parent = parents[tid]
        if tid == parent:
            continue
        if parent not in edges and parent not in enqueued:
            queue.append(parent)
            enqueued.add(parent)
        edges.setdefault(parent, set()).add(tid)

    def create(tid: int) -> _Node:
        return _Node(
            tid,
            taxons.get(tid, f32(0.0)),
            [create(c) for c in sorted(edges.get(tid, ()))],
        )

    return create(root)


def _collapse(node: _Node) -> _Node:
    """src/tree/mod.rs:71-86 — merge single-child chains (summing)."""
    value = node.value
    new = node
    while len(new.children) == 1:
        new = new.children[0]
        value = f32(value + new.value)
    return _Node(new.root, value, [_collapse(c) for c in new.children])


def _aggregate_sums(node: _Node) -> _Node:
    """src/tree/mod.rs:90-101 — subtree sums."""
    children = [_aggregate_sums(c) for c in node.children]
    value = node.value
    for c in children:
        value = f32(value + c.value)
    return _Node(node.root, value, children)


class TreeLCACalculator:
    """src/tree/lca.rs — LCA*: collapse and take the root."""

    def __init__(self, root: int, by_id: TaxonList):
        self.root = root
        self.parents = by_id.ancestry()

    def aggregate(self, counts: Dict[int, np.float32]) -> int:
        if not counts:
            raise EmptyInput()
        return _collapse(_build_tree(self.root, self.parents, counts)).root


class TreeMixCalculator:
    """src/tree/mix.rs — collapse, subtree sums, descend while the
    heaviest child's share >= factor. The Rust max_by_key runs over
    HashSet child order (nondeterministic); ties pinned to the smallest
    child taxon id (matches umgap_tpu's documented pin)."""

    def __init__(self, root: int, by_id: TaxonList, factor: float):
        self.root = root
        self.parents = by_id.ancestry()
        self.factor = f32(factor)

    def aggregate(self, counts: Dict[int, np.float32]) -> int:
        if not counts:
            raise EmptyInput()
        subtree = _aggregate_sums(_collapse(_build_tree(self.root, self.parents, counts)))
        base = subtree
        while base.children:
            # Pinned tie-break: smallest child id among maxima (matches
            # umgap_tpu's documented pin; Rust is nondeterministic here).
            best = base.children[0]
            for c in base.children[1:]:
                if c.value > best.value:
                    best = c
            if f32(best.value / base.value) < self.factor:
                break
            base = best
        return base.root


# ---------------------------------------------------------------------- #
# dna + translation (src/dna/mod.rs, src/dna/translation.rs)
# ---------------------------------------------------------------------- #

_COMPLEMENT = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def to_strand(seq: str) -> str:
    """Non-ACGT becomes N (src/dna/mod.rs:34-44)."""
    return "".join(c if c in "ACGT" else "N" for c in seq)


def reverse_complement(strand: str) -> str:
    return "".join(_COMPLEMENT[c] for c in reversed(strand))


_BASE_ORDER = "TCAG"

# The 64-char AA and start strings for NCBI tables 1-23 (gaps at 7, 8,
# 17-20), embedded published constants (src/dna/translation.rs:47-104).
_TABLES: Dict[int, Tuple[str, str, str]] = {
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


def _codon_of_index(i: int) -> str:
    return _BASE_ORDER[i // 16] + _BASE_ORDER[(i // 4) % 4] + _BASE_ORDER[i % 4]


class TranslationTable:
    def __init__(self, num: int):
        if num not in _TABLES:
            raise OracleError(f"Unknown table: {num}")
        self.index = num
        self.name, aas, starts = _TABLES[num]
        self.table: Dict[str, Tuple[bool, str]] = {}
        for i in range(64):
            self.table[_codon_of_index(i)] = (starts[i] == "M", aas[i])

    def translate(self, methionine: bool, codon: str) -> str:
        start, aa = self.table.get(codon, (False, "-"))
        return "M" if (start and methionine) else aa

    def translate_frame(self, methionine: bool, frame: str) -> str:
        out = []
        for i in range(0, len(frame) - 2, 3):
            out.append(self.translate(methionine, frame[i : i + 3]))
        return "".join(out)

    def show(self) -> str:
        """src/dna/translation.rs:148-174."""
        lines = [f"{self.name}={self.index}"]
        rows = []
        for i in range(64):
            codon = _codon_of_index(i)
            mm, aa = self.table[codon]
            rows.append(aa + ("M" if mm else "-") + codon)
        for j, name in enumerate(["AAs", "Starts", "Base1", "Base2", "Base3"]):
            lines.append("{:<6} = {}".format(name, "".join(r[j] for r in rows)))
        return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------- #
# io (src/io/fasta.rs, src/io/fastq.rs)
# ---------------------------------------------------------------------- #


def _rust_lines(text: str) -> List[str]:
    """Rust BufRead::lines(): split on \\n, strip a trailing \\r, and no
    phantom final empty line for trailing newline."""
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    return [l[:-1] if l.endswith("\r") else l for l in lines]


def read_fasta(text: str, unwrap: bool) -> List[Tuple[str, List[str]]]:
    """src/io/fasta.rs:18-73."""
    lines = _rust_lines(text)
    records: List[Tuple[str, List[str]]] = []
    i = 0
    while i < len(lines):
        header = lines[i]
        if not header.startswith(">"):
            raise OracleError("Expected > at beginning of fasta header.")
        header = header[1:]
        i += 1
        seq: List[str] = []
        while i < len(lines) and not lines[i].startswith(">"):
            seq.append(lines[i])
            i += 1
        if unwrap:
            seq = ["".join(seq)]
        records.append((header, seq))
    return records


FASTA_WIDTH = 70


def write_fasta_record(out: List[str], header: str, sequence: List[str],
                       separator: str = "\n", wrap: bool = False):
    """src/io/fasta.rs:159-181 — preserves the no-newline quirks: an
    empty joined sequence gets no trailing newline, and a wrapped empty
    sequence gets no newline after the header at all."""
    out.append(">" + header)
    seq = separator.join(sequence)
    if not wrap:
        out.append("\n")
        out.append(seq)
    else:
        for i in range(0, len(seq), FASTA_WIDTH):
            out.append("\n")
            out.append(seq[i : i + FASTA_WIDTH])
    if seq:
        out.append("\n")


def read_fastq(text: str) -> List[Tuple[str, str, str]]:
    """src/io/fastq.rs:13-90."""
    lines = _rust_lines(text)
    records = []
    i = 0
    while i < len(lines):
        header = lines[i]
        if not header.startswith("@"):
            raise OracleError("Expected @ at beginning of fastq header.")
        header = header[1:]
        i += 1
        nseq = 0
        seq = []
        while i < len(lines) and not lines[i].startswith("+"):
            seq.append(lines[i])
            i += 1
            nseq += 1
        if i >= len(lines) or not lines[i].startswith("+"):
            raise OracleError("Expected a + as separator.")
        i += 1
        qual = []
        for _ in range(nseq):
            if i >= len(lines):
                raise OracleError("Expected as many quality lines as sequence lines.")
            qual.append(lines[i])
            i += 1
        records.append((header, "".join(seq), "".join(qual)))
    return records


# ---------------------------------------------------------------------- #
# commands (src/commands/*.rs) — each returns the stdout string
# ---------------------------------------------------------------------- #


def translate(stdin: str, methionine: bool = False, all_frames: bool = False,
              frames: Sequence[str] = (), append_name: bool = False,
              table: str = "1", show_table: bool = False) -> str:
    """src/commands/translate.rs."""
    tt = TranslationTable(int(table))
    if show_table:
        return tt.show()
    names = ["1", "2", "3", "1R", "2R", "3R"] if all_frames else list(frames)
    out: List[str] = []
    for header, sequence in read_fasta(stdin, unwrap=True):
        forward = to_strand(sequence[0])
        reverse = reverse_complement(forward)
        for name in names:
            frame_no = int(name[0])
            strand = reverse if name.endswith("R") else forward
            sub = strand[frame_no - 1 :] if len(strand) > frame_no - 1 else ""
            write_fasta_record(
                out,
                header + "|" + name if append_name else header,
                [tt.translate_frame(methionine, sub)],
                separator="",
            )
    return "".join(out)


def fastq2fasta(file_texts: Sequence[str]) -> str:
    """src/commands/fastq2fasta.rs — round-robin interleave, stop at the
    shortest input."""
    streams = [read_fastq(t) for t in file_texts]
    out: List[str] = []
    for group in zip(*streams):
        for header, seq, _qual in group:
            write_fasta_record(out, header, [seq], separator="")
    return "".join(out)


def prot2kmer(stdin: str, k: int = 9) -> str:
    """src/commands/prot2kmer.rs."""
    out: List[str] = []
    for header, sequence in read_fasta(stdin, unwrap=True):
        seq = sequence[0]
        if len(seq) < k:
            continue
        write_fasta_record(out, header,
                           [seq[i : i + k] for i in range(len(seq) - k + 1)])
    return "".join(out)


def _tryp_digest(seq: str, pattern: re.Pattern) -> List[str]:
    """The double regex replacement + '*' split of prot2tryp
    (src/commands/prot2tryp.rs:57-64)."""
    first = pattern.sub(r"\1\n\2", seq)
    second = pattern.sub(r"\1\n\2", first).replace("*", "\n")
    return [x for x in second.split("\n") if x]


def prot2tryp(stdin: str, pattern: str = "([KR])([^P])") -> str:
    pat = re.compile(pattern)
    out: List[str] = []
    for header, sequence in read_fasta(stdin, unwrap=True):
        write_fasta_record(out, header, _tryp_digest(sequence[0], pat))
    return "".join(out)


def filter_cmd(stdin: str, min_length: int = 5, max_length: int = 50,
               contains: str = "", lacks: str = "") -> str:
    """src/commands/filter.rs."""
    cset, lset = set(contains), set(lacks)
    out: List[str] = []
    for header, sequence in read_fasta(stdin, unwrap=False):
        kept = [
            s for s in sequence
            if min_length <= len(s) <= max_length
            and cset <= set(s) and not (lset & set(s))
        ]
        write_fasta_record(out, header, kept)
    return "".join(out)


def pept2lca(stdin: str, index: Dict[str, int], one_on_one: bool = False) -> str:
    """src/commands/pept2lca.rs (sequential; order-deterministic)."""
    out: List[str] = []
    for header, sequence in read_fasta(stdin, unwrap=False):
        out.append(f">{header}\n")
        for seq in sequence:
            if seq in index:
                out.append(f"{index[seq]}\n")
            elif one_on_one:
                out.append("0\n")
    return "".join(out)


def prot2kmer2lca(stdin: str, index: Dict[str, int], k: int = 9,
                  one_on_one: bool = False) -> str:
    """src/commands/prot2kmer2lca.rs:150-193 — drops records shorter
    than k entirely (header included)."""
    out: List[str] = []
    for header, sequence in read_fasta(stdin, unwrap=True):
        prot = sequence[0]
        if len(prot) < k:
            continue
        out.append(f">{header}\n")
        for i in range(len(prot) - k + 1):
            kmer = prot[i : i + k]
            if kmer in index:
                out.append(f"{index[kmer]}\n")
            elif one_on_one:
                out.append("0\n")
    return "".join(out)


def prot2tryp2lca(stdin: str, index: Dict[str, int],
                  pattern: str = "([KR])([^P])", min_length: int = 5,
                  max_length: int = 50, contains: str = "", lacks: str = "",
                  one_on_one: bool = False) -> str:
    """src/commands/prot2tryp2lca.rs — header always emitted; peptide
    char filters only applied when either set is non-empty."""
    pat = re.compile(pattern)
    cset, lset = set(contains), set(lacks)
    out: List[str] = []
    for header, sequence in read_fasta(stdin, unwrap=False):
        out.append(f">{header}\n")
        for seq in sequence:
            for pep in _tryp_digest(seq, pat):
                if not (min_length <= len(pep) <= max_length):
                    continue
                if cset or lset:
                    s = set(pep)
                    if not (cset <= s) or (lset & s):
                        continue
                if pep in index:
                    out.append(f"{index[pep]}\n")
                elif one_on_one:
                    out.append("0\n")
    return "".join(out)


def seedextend(stdin: str, min_seed_size: int = 2, max_gap_size: int = 0,
               ranked: Optional[str] = None, penalty: int = 5) -> str:
    """src/commands/seedextend.rs:82-178 — exact state machine."""
    by_id = None
    if ranked is not None:
        by_id = TaxonList(read_taxa(ranked), with_unknown=True)
    out: List[str] = []
    for header, sequence in read_fasta(stdin, unwrap=False):
        taxons = [int(s) for s in sequence]
        taxons.append(0)

        seeds: List[Tuple[int, int]] = []
        start, end = 0, 1
        last_tid = taxons[start]
        same_tid = 1
        same_max = 1
        while end < len(taxons):
            if last_tid == taxons[end]:
                same_tid += 1
                end += 1
                continue
            if last_tid == 0 and same_tid > max_gap_size:
                if same_max >= min_seed_size:
                    seeds.append((start, end - same_tid))
                start = end
                last_tid = taxons[end]
                same_tid = 1
                same_max = 1
                end += 1
                continue
            if last_tid == 0 and (end - start) == same_tid:
                end += 1
                start = end
                continue
            if last_tid != 0:
                same_max = max(same_max, same_tid)
            last_tid = taxons[end]
            same_tid = 1
            end += 1
        if same_max >= min_seed_size:
            if last_tid == 0:
                end -= same_tid
            seeds.append((start, end))

        if by_id is not None and seeds:
            # max_by_key keeps the LAST maximum.
            def score_of(se: Tuple[int, int]) -> int:
                s, e = se
                total = 0
                for t in taxons[s:e]:
                    sc = by_id.score(t)
                    total += sc if sc is not None else penalty
                return total

            best, best_score = seeds[0], score_of(seeds[0])
            for se in seeds[1:]:
                sc = score_of(se)
                if sc >= best_score:
                    best, best_score = se, sc
            seeds = [best]

        flat = [str(t) for s, e in seeds for t in taxons[s:e]]
        write_fasta_record(out, header, flat)
    return "".join(out)


def uniq(stdin: str, separator: str = "\n", wrap: bool = False,
         delimiter: Optional[str] = None) -> str:
    """src/commands/uniq.rs."""
    out: List[str] = []
    last: Optional[Tuple[str, List[str]]] = None
    for header, sequence in read_fasta(stdin, unwrap=False):
        if delimiter is not None:
            pos = header.find(delimiter)
            if pos >= 0:
                header = header[:pos]
        if last is not None:
            if last[0] == header:
                last[1].extend(sequence)
            else:
                write_fasta_record(out, last[0], last[1], separator, wrap)
                last = (header, list(sequence))
        else:
            last = (header, list(sequence))
    if last is not None:
        write_fasta_record(out, last[0], last[1], separator, wrap)
    return "".join(out)


def bestof(stdin: str, frames: int = 6) -> str:
    """src/commands/bestof.rs:52-79 — the final record of each group is
    never added to the buffer (it triggers processing and is dropped);
    max_by_key keeps the last maximum."""
    out: List[str] = []
    chunk: List[Tuple[str, List[str]]] = []

    def nonroot_count(rec: Tuple[str, List[str]]) -> int:
        n = 0
        for tid in rec[1]:
            try:
                v = int(tid)
            except ValueError:
                v = 0
            if v not in (0, 1):
                n += 1
        return n

    for record in read_fasta(stdin, unwrap=False):
        if len(chunk) < frames - 1:
            chunk.append(record)
        else:
            best, best_n = chunk[0], nonroot_count(chunk[0])
            for rec in chunk[1:]:
                n = nonroot_count(rec)
                if n >= best_n:
                    best, best_n = rec, n
            write_fasta_record(out, best[0], best[1])
            chunk.clear()
    return "".join(out)


def make_aggregator(method: str, strategy: str, tree: TaxonTree,
                    by_id: TaxonList, factor: float):
    """src/commands/taxa2agg.rs:111-140 dispatch."""
    key = (method, strategy)
    if key == ("rmq", "mrtl"):
        return RTLCalculator(tree.root, by_id)
    if key == ("rmq", "lca*"):
        return RmqLCACalculator(tree)
    if key == ("rmq", "hybrid"):
        return RmqMixCalculator(tree, factor)
    if key == ("tree", "lca*"):
        return TreeLCACalculator(tree.root, by_id)
    if key == ("tree", "hybrid"):
        return TreeMixCalculator(tree.root, by_id, factor)
    raise OracleError(f"{method} and {strategy} cannot be combined")


def taxa2agg(stdin: str, taxa_text: str, scored: bool = False,
             ranked_only: bool = False, method: str = "tree",
             strategy: str = "hybrid", factor: float = 0.25,
             lower_bound: float = 0.0) -> str:
    """src/commands/taxa2agg.rs:102-183."""
    taxa = read_taxa(taxa_text)
    tree = TaxonTree(taxa)
    by_id = TaxonList(taxa)
    snapping = tree.snapping(by_id, ranked_only)
    aggregator = make_aggregator(method, strategy, tree, by_id, factor)

    def parse(item: str) -> Tuple[int, float]:
        if scored:
            split = item.split("=")
            if len(split) != 2:
                raise OracleError("Taxon without score")
            return int(split[0]), float(split[1])
        return int(item), 1.0

    out: List[str] = []
    for header, sequence in read_fasta(stdin, unwrap=False):
        pairs = [parse(s) for s in sequence]
        counts = agg_count((t, c) for t, c in pairs if t != 0)
        counts = agg_filter(counts, lower_bound)
        if not counts:
            result = ["1"]
        else:
            aggregate = aggregator.aggregate(counts)
            result = [str(snapping[aggregate])]
        write_fasta_record(out, header, result)
    return "".join(out)


def taxa2freq(taxa_text: str, inputs: Sequence[Tuple[str, str]],
              rank: str = "species", min_frequency: int = 1) -> str:
    """src/commands/taxa2freq.rs — inputs is a list of (name, text)
    pairs; pass [("stdin", text)] for the stdin form. Unparseable lines
    are skipped; rows with sum <= min_frequency are dropped (strict >).
    Row ties (equal totals) are pinned to ascending taxon id."""
    taxa = read_taxa(taxa_text)
    rank_idx = parse_rank(rank)
    if rank_idx == NO_RANK:
        raise OracleError("Snap to an actual rank.")
    tree = TaxonTree(taxa)
    by_id = TaxonList(taxa)
    snapping = tree.filter_ancestors(
        lambda tid: (by_id.get(tid) is not None and by_id.get(tid).rank == rank_idx)
    )

    numfiles = len(inputs)
    header_cells = ["taxon id,taxon name"] + [name for name, _ in inputs]
    out = [",".join(header_cells) + "\n"]

    counts: Dict[int, List[int]] = {}
    for i, (_name, text) in enumerate(inputs):
        for line in _rust_lines(text):
            try:
                taxon = int(line)
            except ValueError:
                continue
            snapped = snapping[taxon] if 0 <= taxon < len(snapping) else None
            key = snapped if snapped is not None else 0
            row = counts.setdefault(key, [0] * numfiles)
            row[i] += 1

    # Rust: stable ascending sort by total over HashMap order, then
    # reversed — tie order nondeterministic. Pinned: descending total,
    # ties by ascending taxon id (matches umgap_tpu's pin).
    items = sorted(counts.items(), key=lambda p: (-sum(p[1]), p[0]))
    for tid, row in items:
        taxon = by_id.get(tid)
        if taxon is None:
            raise OracleError(
                "LCA taxon id not in taxon list. Check compatibility with index.")
        if sum(row) > min_frequency:
            out.append(f"{taxon.id},{taxon.name}," + ",".join(str(c) for c in row) + "\n")
    return "".join(out)


def snaptaxon(stdin: str, taxa_text: str, rank: Optional[str] = None,
              taxons: Sequence[int] = (), invalid: bool = False) -> str:
    """src/commands/snaptaxon.rs."""
    taxa = read_taxa(taxa_text)
    rank_idx = parse_rank(rank) if rank is not None else None
    if rank_idx == NO_RANK:
        raise OracleError("Snap to an actual rank.")
    tree = TaxonTree(taxa)
    by_id = TaxonList(taxa)
    tset = set(taxons)

    def pred(tid: int) -> bool:
        if tid in tset:
            return True
        t = by_id.get(tid)
        if t is None:
            return False
        return (invalid or t.valid) and (rank_idx is not None and t.rank == rank_idx)

    snapping = tree.filter_ancestors(pred)
    out: List[str] = []
    for line in _rust_lines(stdin):
        if line.startswith(">"):
            out.append(line + "\n")
        else:
            taxon = int(line)
            snapped = snapping[taxon] if 0 <= taxon < len(snapping) else None
            out.append(f"{snapped if snapped is not None else 0}\n")
    return "".join(out)


def taxonomy_cmd(stdin: str, taxa_text: str, all_ranks: bool = False,
                 no_header: bool = False) -> str:
    """src/commands/taxonomy.rs."""
    by_id = TaxonList(read_taxa(taxa_text))
    out: List[str] = []
    if not no_header:
        head = "taxon_id\ttaxon_name\ttaxon_rank"
        if all_ranks:
            for rname in RANK_NAMES[1:]:
                r = rname.replace(" ", "_")
                head += f"\t{r}_id\t{r}_name"
        out.append(head + "\n")
    for line in _rust_lines(stdin):
        if line.startswith(">"):
            out.append(line + "\n")
            continue
        tid = int(line)
        taxon = by_id.get_or_unknown(tid)
        row = f"{taxon.id}\t{taxon.name}\t{RANK_NAMES[taxon.rank]}"
        if all_ranks:
            lineage = by_id.lineage(tid)
            for r in range(1, RANK_COUNT):
                lt = lineage[r]
                row += f"\t{lt.id}\t{lt.name}" if lt is not None else "\t\t"
        out.append(row + "\n")
    return "".join(out)


def splitkmers(stdin: str, k: int = 9, prefix: str = "") -> str:
    """src/commands/splitkmers.rs — TSV (taxid, sequence) to (kmer, taxid);
    with a prefix char, emit only (k-1)-suffixes of matching k-mers."""
    byte = prefix[0] if prefix else None
    out: List[str] = []
    for line in _rust_lines(stdin):
        fields = line.split("\t")
        tid, sequence = int(fields[0]), fields[1]
        if len(sequence) < k:
            continue
        for i in range(len(sequence) - k + 1):
            kmer = sequence[i : i + k]
            if byte is not None:
                if kmer[0] == byte:
                    out.append(f"{kmer[1:]}\t{tid}\n")
            else:
                out.append(f"{kmer}\t{tid}\n")
    return "".join(out)


def joinkmers(stdin: str, taxa_text: str) -> str:
    """src/commands/joinkmers.rs — group consecutive equal k-mers, snap
    to valid ancestors, aggregate with tree::mix f=0.95, rank-snap."""
    taxa = read_taxa(taxa_text)
    tree = TaxonTree(taxa)
    by_id = TaxonList(taxa)
    ranksnapping = tree.snapping(by_id, True)
    validsnapping = tree.snapping(by_id, False)
    aggregator = TreeMixCalculator(tree.root, by_id, 0.95)

    out: List[str] = []

    def emit(kmer: str, tids: List[Tuple[int, float]]):
        counts = agg_count(tids)
        try:
            aggregate = aggregator.aggregate(counts)
        except OracleError:
            return
        taxon = ranksnapping[aggregate]
        rank = by_id.get_or_unknown(taxon).rank
        out.append(f"{kmer}\t{taxon}\t{RANK_NAMES[rank]}\n")

    current_kmer: Optional[str] = None
    current_tids: List[Tuple[int, float]] = []
    for line in _rust_lines(stdin):
        fields = line.split("\t")
        kmer, tid = fields[0], int(fields[1])
        if current_kmer is not None and current_kmer != kmer:
            emit(current_kmer, current_tids)
            current_tids = []
        current_kmer = kmer
        if 0 <= tid < len(validsnapping) and validsnapping[tid] is not None:
            current_tids.append((validsnapping[tid], 1.0))
    if current_kmer is not None:
        emit(current_kmer, current_tids)
    return "".join(out)


def buildindex(stdin: str) -> Dict[str, int]:
    """src/commands/buildindex.rs — sorted TSV to a map (the oracle's
    'index' is a plain dict; the FST binary format is not reproduced)."""
    index: Dict[str, int] = {}
    for line in _rust_lines(stdin):
        fields = line.split("\t")
        index[fields[0]] = int(fields[1])
    return index


def printindex(index: Dict[str, int]) -> str:
    """src/commands/printindex.rs — stream back as TSV in key order."""
    return "".join(f"{k}\t{v}\n" for k, v in sorted(index.items()))


def taxa2tree_payload(stdin: str, url: bool = False) -> Dict:
    """src/commands/taxa2tree.rs:41-52 — the JSON body POSTed to the
    Unipept API (the HTTP call itself is not reproduced)."""
    taxa: Dict[int, int] = {}
    for header, sequence in read_fasta(stdin, unwrap=False):
        taxon = int(sequence[0])
        taxa[taxon] = taxa.get(taxon, 0) + 1
    return {"counts": {str(k): v for k, v in taxa.items()}, "link": str(url).lower()}
