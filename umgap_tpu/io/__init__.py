"""Host-side streaming IO: FASTA/FASTQ with reference-equivalent record
semantics (reference /root/reference/src/io/)."""

from . import fasta, fastq  # noqa: F401
