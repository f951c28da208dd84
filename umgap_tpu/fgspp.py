"""FragGeneScan++ gene-prediction front end (optional external binary).

The reference's four precision presets pipe reads through FGSpp when it
is installed under the config dir (/root/reference/scripts/
umgap-analyse.sh:248-251, 276-311); it is an optional external
dependency there too (README.md:44-46).  This wrapper mirrors the exact
plumbing — ``<configdir>/FGSpp/FGSpp -s stdin -o stdout -w 0
-r <configdir>/FGSpp/train -t illumina_10 -p 4 -c 2`` — feeding the
sample as FASTA on stdin and reading predicted protein records from
stdout.  When the binary is absent the pipelines fall back to the
self-contained 6-frame translation front end (the package default)."""

from __future__ import annotations

import os
import subprocess
import threading
from typing import Iterable, Iterator, List, Optional, Tuple

# Presets whose reference pipeline runs FGSpp (umgap-analyse.sh cases)
FGSPP_PRESETS = frozenset({
    "tryptic-sensitivity", "tryptic-precision",
    "high-precision", "max-precision",
})


def find_fgspp(configdir: str) -> Optional[Tuple[str, str]]:
    """(binary, train dir) when FGSpp is installed under the config dir
    the way umgap-setup lays it out; None otherwise."""
    binary = os.path.join(configdir, "FGSpp", "FGSpp")
    train = os.path.join(configdir, "FGSpp", "train")
    if os.path.isfile(binary) and os.access(binary, os.X_OK) \
            and os.path.isdir(train):
        return binary, train
    return None


def fgspp_command(binary: str, train: str, train_type: str = "illumina_10",
                  threads: int = 4, chunk: int = 2) -> List[str]:
    """The reference's exact invocation (umgap-analyse.sh:249-251)."""
    return [binary, "-s", "stdin", "-o", "stdout", "-w", "0",
            "-r", train, "-t", train_type, "-p", str(threads),
            "-c", str(chunk)]


def predict_genes(binary: str, train: str,
                  records: Iterable[Tuple[str, str]],
                  **kw) -> Iterator[Tuple[str, str]]:
    """Run reads through FGSpp: ``records`` are (header, dna) pairs
    (headers WITH their /1 or /2 end markers); yields (header, protein)
    gene records in FGSpp's output order.  Reads without predicted
    genes yield nothing — faithful to the reference pipeline, whose
    downstream stages only see records FGSpp emits."""
    proc = subprocess.Popen(
        fgspp_command(binary, train, **kw),
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL)
    feed_error: List[BaseException] = []

    def feed():
        try:
            for header, dna in records:
                proc.stdin.write(f">{header}\n{dna}\n".encode())
        except BrokenPipeError:
            pass
        except BaseException as e:  # noqa: BLE001 — re-raised below
            feed_error.append(e)
        finally:
            # always close stdin: a reader error must end FGSpp's input
            # (otherwise it blocks forever and so would we)
            try:
                proc.stdin.close()
            except OSError:
                pass

    writer = threading.Thread(target=feed, daemon=True)
    writer.start()
    header = None
    seq: List[str] = []
    done = False
    try:
        for raw in proc.stdout:
            line = raw.decode().rstrip("\n")
            if line.startswith(">"):
                if header is not None:
                    yield header, "".join(seq)
                header = line[1:]
                seq = []
            elif header is not None:
                seq.append(line)
        if header is not None:
            yield header, "".join(seq)
        done = True
    finally:
        if not done:
            # the consumer abandoned the generator (downstream error or
            # GeneratorExit): kill FGSpp so the process and the writer
            # thread don't linger until interpreter exit
            proc.kill()
        writer.join()
        rc = proc.wait()
    if feed_error:
        raise feed_error[0]
    if rc != 0:
        raise RuntimeError(f"FGSpp exited with status {rc}")


def group_genes(records: Iterable[Tuple[str, str]], delimiter: str = "/"):
    """uniq -d semantics over FGSpp output: merge CONSECUTIVE records
    whose header (cut at the delimiter — which also strips FGSpp's
    _start_end_strand suffix along with the end marker) agree into one
    (header, [proteins]) group.

    Headers WITHOUT the delimiter (single-end inputs) keep their FGSpp
    suffix and do not merge — faithfully mirroring the reference, whose
    ``uniq -d /`` also only truncates at '/' (umgap-analyse.sh:303)."""
    cur: Optional[str] = None
    seqs: List[str] = []
    for header, protein in records:
        idx = header.find(delimiter)
        key = header[:idx] if idx != -1 else header
        if cur is None:
            cur, seqs = key, [protein]
        elif key == cur:
            seqs.append(protein)
        else:
            yield cur, seqs
            cur, seqs = key, [protein]
    if cur is not None:
        yield cur, seqs
