"""Stderr logging gated on VERBOSE/DEBUG env vars.

Mirrors the conventions of the reference's shell helpers
(/root/reference/scripts/umgap-analyse.sh:64-73): ``log`` always
writes, ``verbose`` only with VERBOSE set, ``debug`` only with DEBUG
set (and implies verbose).
"""

from __future__ import annotations

import os
import sys
import time


def _enabled(var: str) -> bool:
    v = os.environ.get(var, "")
    return v not in ("", "0", "false", "False")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def verbose(msg: str) -> None:
    if _enabled("VERBOSE") or _enabled("DEBUG"):
        log(f"[{time.strftime('%H:%M:%S')}] {msg}")


def debug(msg: str) -> None:
    if _enabled("DEBUG"):
        log(f"[{time.strftime('%H:%M:%S')} debug] {msg}")
