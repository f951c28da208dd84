"""Generate an at-scale (taxid TAB protein) TSV + synthetic taxonomy for
``buildindex-dist --tsv`` scale runs — the production input path
(counterpart of the reference's UniProt dump consumed by
/root/reference/scripts/build-index-phanpy.hpc.sh).

Usage: gen_scale_tsv.py OUTDIR N_PROTEINS [PROT_LEN=300] [N_TAX=200000]

Writes OUTDIR/seqs.tsv and OUTDIR/taxons.tsv.  N proteins of PROT_LEN
random standard amino acids give N*(PROT_LEN-8) 9-mer rows (~all
distinct at these sizes: 20^9 = 5.1e11 key space).
"""

import os
import sys
import time

import numpy as np

AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)


def main():
    outdir = sys.argv[1]
    n = int(float(sys.argv[2]))
    plen = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    n_tax = int(sys.argv[4]) if len(sys.argv) > 4 else 200_000
    os.makedirs(outdir, exist_ok=True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from umgap_tpu.index.distbuild import write_synthetic_taxonomy

    tax_path = os.path.join(outdir, "taxons.tsv")
    if not os.path.exists(tax_path):
        write_synthetic_taxonomy(tax_path, n_tax, seed=7)

    rng = np.random.default_rng(42)
    t0 = time.perf_counter()
    chunk = 200_000
    path = os.path.join(outdir, "seqs.tsv")
    with open(path, "wb", buffering=1 << 22) as f:
        done = 0
        while done < n:
            m = min(chunk, n - done)
            tids = rng.integers(2, n_tax + 1, size=m)
            chars = AA[rng.integers(0, len(AA), size=(m, plen))]
            prots = np.frombuffer(chars.tobytes(), dtype=f"S{plen}")
            f.write(b"".join(
                b"%d\t%s\n" % (t, p)
                for t, p in zip(tids.tolist(), prots)))
            done += m
    dt = time.perf_counter() - t0
    sz = os.path.getsize(path)
    print(f"wrote {n} proteins ({sz / 1e9:.2f} GB, "
          f"{n * (plen - 8)} kmer rows) in {dt:.1f}s")


if __name__ == "__main__":
    main()
