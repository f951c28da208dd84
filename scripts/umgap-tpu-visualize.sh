#!/bin/sh
# Visualize umgap_tpu results: frequency tables or Unipept trees.
# Thin wrapper over `umgap-tpu visualize` (counterpart of
# /root/reference/scripts/umgap-visualize.sh): config-dir taxonomy
# discovery, gzip input sniffing, and directory-stripped CSV headers
# live in the Python subcommand.
set -e

usage() {
	cat <<USAGE
Usage: $0 [-c configdir] (-t [-r rank] | -w | -u) file...
  -t        CSV frequency table (taxa2freq) at the target rank
  -w        HTML visualization via the Unipept API (taxa2tree)
  -u        URL to the online visualization (taxa2tree -u)
  -r rank   target rank for -t (default species)
USAGE
	exit 1
}

configdir=""
mode=""
rank="species"
while getopts c:twur:h opt; do
	case "$opt" in
	c) configdir="$OPTARG" ;;
	t) mode=freq ;;
	w) mode=html ;;
	u) mode=url ;;
	r) rank="$OPTARG" ;;
	*) usage ;;
	esac
done
shift $((OPTIND - 1))
[ -n "$mode" ] || usage

copt=""
[ -n "$configdir" ] && copt="-c $configdir"

case "$mode" in
freq) exec python -m umgap_tpu visualize -t "$rank" $copt "$@" ;;
html) exec python -m umgap_tpu visualize -w $copt "$@" ;;
url) exec python -m umgap_tpu visualize -u $copt "$@" ;;
esac
