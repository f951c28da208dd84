#!/bin/sh
# Analyse metagenomics samples with umgap_tpu preset pipelines.
#
# The counterpart of the reference's umgap-analyse.sh
# (/root/reference/scripts/umgap-analyse.sh): where that script wires
# 5-7 processes per sample with pipes, FIFOs, and a Unix-socket index
# service, the TPU pipelines are fused device programs and the index
# stays resident in HBM across samples, so this wrapper only handles
# sample bookkeeping and gzip sniffing.
set -e

usage() {
	cat <<EOF
Usage: $0 [options] -1 <r1.fq[.gz]> [-2 <r2.fq[.gz]>] -o <output.fa> [more samples...]
Options:
  -c dir    config directory (default: \$XDG_CONFIG_HOME/umgap-tpu or ~/.config/umgap-tpu)
  -t type   max-sensitivity | high-sensitivity | high-precision (default)
            | max-precision | tryptic-sensitivity | tryptic-precision
  -z        gzipped input
EOF
	exit 1
}

configdir=""
type="high-precision"
samples=""

getconfigdir() {
	if [ -n "$configdir" ]; then echo "$configdir"
	elif [ -n "$XDG_CONFIG_HOME" ]; then echo "$XDG_CONFIG_HOME/umgap-tpu"
	else echo "$HOME/.config/umgap-tpu"
	fi
}

while getopts c:t:1:2:o:zh opt; do
	case "$opt" in
	c) configdir="$OPTARG" ;;
	t) type="$OPTARG" ;;
	1) one="$OPTARG" ;;
	2) two="$OPTARG" ;;
	o)
		samples="$samples$type	$one	$two	$OPTARG
"
		two=""
		;;
	z) gzipped=true ;;
	*) usage ;;
	esac
done
[ -n "$samples" ] || usage

cfg="$(getconfigdir)"
taxons="$cfg/taxons.tsv"
case "$type" in
tryptic-*) index="$cfg/tryptic.index.npz" ;;
*) index="$cfg/ninemer.index.npz" ;;
esac
[ -r "$taxons" ] || { echo "missing $taxons (run umgap-tpu-setup.sh)" >&2; exit 2; }
[ -r "$index" ] || { echo "missing $index (run umgap-tpu-setup.sh)" >&2; exit 2; }

tmp="$(mktemp -d)"
trap 'rm -rf "$tmp"' EXIT INT TERM

printf '%s' "$samples" | while IFS="	" read -r stype r1 r2 out; do
	[ -n "$stype" ] || continue
	in1="$r1"; in2="$r2"
	if [ "$gzipped" = true ]; then
		zcat "$r1" > "$tmp/r1.fq"; in1="$tmp/r1.fq"
		if [ -n "$r2" ]; then zcat "$r2" > "$tmp/r2.fq"; in2="$tmp/r2.fq"; fi
	fi
	if [ -n "$in2" ]; then
		python -m umgap_tpu analyse -t "$stype" -1 "$in1" -2 "$in2" \
			--taxons "$taxons" --index "$index" > "$out"
	else
		python -m umgap_tpu analyse -t "$stype" -1 "$in1" \
			--taxons "$taxons" --index "$index" > "$out"
	fi
done
