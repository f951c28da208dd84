#!/bin/sh
# Build a 9-mer index from a (taxid TAB protein) TSV dump.
#
# Counterpart of the reference's offline build chain
# `splitkmers | sort | joinkmers | buildindex`
# (/root/reference/src/commands/splitkmers.rs etc.) and its PBS cluster
# job (scripts/build-index-phanpy.hpc.sh). Two paths:
#   default : the fast native path (C++ k-mer splitting + batched
#             device aggregation)
#   -s      : the stream-command path (byte-compatible with the
#             reference chain; useful for sharded builds with -p)
set -e

usage() {
	echo "Usage: $0 [-s] [-k 9] <sequences.tsv[.gz]> <taxons.tsv> <out.index.npz>" >&2
	exit 1
}

k=9
stream=false
while getopts sk:h opt; do
	case "$opt" in
	s) stream=true ;;
	k) k="$OPTARG" ;;
	*) usage ;;
	esac
done
shift $((OPTIND - 1))
[ $# -eq 3 ] || usage
seqs="$1"; taxons="$2"; out="$3"

catcmd="cat"
case "$seqs" in *.gz) catcmd="zcat" ;; esac

if [ "$stream" = true ]; then
	$catcmd "$seqs" \
	| python -m umgap_tpu splitkmers -k "$k" \
	| sort \
	| python -m umgap_tpu joinkmers "$taxons" \
	| cut -f1,2 \
	| python -m umgap_tpu buildindex > "$out"
else
	$catcmd "$seqs" | python -c '
import sys

from umgap_tpu.index.build import build_kmer_index_fast
from umgap_tpu.taxonomy import Taxonomy, read_taxa_file

taxons, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
tax = Taxonomy(read_taxa_file(taxons))
table = build_kmer_index_fast(sys.stdin.buffer.read(), tax, k=k)
table.save(out)
print(f"built {table.n} keys -> {out}", file=sys.stderr)
' "$taxons" "$out" "$k"
fi
