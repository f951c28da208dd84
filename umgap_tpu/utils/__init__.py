"""Shared utilities: logging, stage timing, and device tracing.

The reference has no in-process observability beyond stderr logging
gated on VERBOSE/DEBUG in its shell scripts
(/root/reference/scripts/umgap-analyse.sh:64-73). This package gives
the TPU framework the pieces the reference lacks: structured stderr
logging with the same env-var gating, per-stage wall timers with
device synchronization, and a JAX profiler trace context for xprof.
"""

from .logging import debug, log, verbose
from .profiling import StageTimer, device_trace, sync

__all__ = [
    "debug",
    "log",
    "verbose",
    "StageTimer",
    "device_trace",
    "sync",
]
