"""Drive all six fused `analyse` presets as REAL subprocesses on the
default (TPU) backend and byte-compare against the committed golden
corpus.

The CI suite runs on the CPU backend; real TPUs can diverge numerically
(e.g. the MXU's default-bf16 f32 matmuls — see PARITY.md "On-hardware
parity"), so this script is the hardware leg of the parity story.

Usage: python scripts/verify_on_chip.py   (~6 compiles, a few minutes)
"""
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
G = os.path.join(REPO, "tests", "golden")
TESTDATA = "/root/reference/testdata"

CASES = [
    ("max-sensitivity", "pipeline_max_sensitivity", "ninemer"),
    ("high-sensitivity", "pipeline_high_sensitivity", "ninemer"),
    ("high-precision", "pipeline_high_precision", "ninemer"),
    ("max-precision", "pipeline_max_precision", "ninemer"),
    ("tryptic-sensitivity", "pipeline_tryptic_sensitivity", "tryptic"),
    ("tryptic-precision", "pipeline_tryptic_precision", "tryptic"),
]


def build_index(kind: str, out_path: str):
    with open(os.path.join(G, "data", f"{kind}.tsv")) as f:
        kv = f.read()
    with open(out_path, "wb") as out:
        r = subprocess.run(
            [sys.executable, "-m", "umgap_tpu", "buildindex"],
            input=kv.encode(), stdout=out, stderr=subprocess.PIPE, cwd=REPO)
    if r.returncode != 0:
        raise SystemExit(f"buildindex {kind} failed: {r.stderr[-400:]}")


def main():
    failures = 0
    with tempfile.TemporaryDirectory() as d:
        idx = {}
        for kind in ("ninemer", "tryptic"):
            idx[kind] = os.path.join(d, f"{kind}.npz")
            build_index(kind, idx[kind])
        for preset, name, kind in CASES:
            r = subprocess.run(
                [sys.executable, "-m", "umgap_tpu", "analyse", "-t", preset,
                 "-1", os.path.join(TESTDATA, "A1.fq"),
                 "-2", os.path.join(TESTDATA, "A2.fq"),
                 "--taxons", os.path.join(G, "data", "taxonomy.tsv"),
                 "--index", idx[kind],
                 "--batch-size", "64", "--read-length", "100"],
                capture_output=True, text=True, cwd=REPO)
            if r.returncode != 0:
                print(f"FAIL {preset}: rc={r.returncode}\n{r.stderr[-300:]}")
                failures += 1
                continue
            with open(os.path.join(G, "expected", f"{name}.golden")) as f:
                golden = f.read()
            ok = r.stdout == golden
            print(f"{'OK  ' if ok else 'FAIL'} {preset}: "
                  f"{'byte-identical' if ok else 'DIVERGES from golden'}")
            failures += 0 if ok else 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
