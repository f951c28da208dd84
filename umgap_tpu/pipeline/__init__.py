"""Fused analysis pipelines.

Where the reference composes 5-7 OS processes with pipes and a Unix
socket per sample (/root/reference/scripts/umgap-analyse.sh:276-311),
this package fuses the whole read->taxon path into one jitted device
program: translate -> k-mer pack -> index probe -> seed-extend ->
frequency dedup -> aggregate -> snap, with the index HBM-resident.
"""

from .fused import PipelineConfig, PRESETS, make_pipeline  # noqa: F401
from .runner import analyse_paired, analyse_stream  # noqa: F401
from .tryptic import (TRYPTIC_PRESETS, analyse_tryptic_device,  # noqa: F401
                      analyse_tryptic_groups)
