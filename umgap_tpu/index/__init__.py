"""The k-mer index: offline build (splitkmers/joinkmers/buildindex
equivalents) and the packed open-addressing hash table that replaces the
reference's FST (/root/reference/src/commands/buildindex.rs) with an
HBM-resident, gather-probeable array structure."""

from .table import KmerTable, PeptideTable  # noqa: F401
