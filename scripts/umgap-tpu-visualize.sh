#!/bin/sh
# Visualize umgap_tpu results: frequency tables or Unipept trees.
# Counterpart of /root/reference/scripts/umgap-visualize.sh.
set -e

usage() {
	cat <<EOF
Usage: $0 [-c configdir] (-t | -w | -u) [-r rank] [-f min] file...
  -t        output a CSV frequency table (taxa2freq) on the given rank
  -w        output an HTML visualization via the Unipept API (taxa2tree)
  -u        output a URL to the online visualization (taxa2tree -u)
  -r rank   target rank for -t (default species)
  -f min    minimum frequency for -t (default 1)
EOF
	exit 1
}

configdir=""
mode=""
rank="species"
freq="1"
while getopts c:twur:f:h opt; do
	case "$opt" in
	c) configdir="$OPTARG" ;;
	t) mode=freq ;;
	w) mode=html ;;
	u) mode=url ;;
	r) rank="$OPTARG" ;;
	f) freq="$OPTARG" ;;
	*) usage ;;
	esac
done
shift $((OPTIND - 1))
[ -n "$mode" ] || usage

if [ -z "$configdir" ]; then
	if [ -n "$XDG_CONFIG_HOME" ]; then configdir="$XDG_CONFIG_HOME/umgap-tpu"
	else configdir="$HOME/.config/umgap-tpu"; fi
fi

case "$mode" in
freq)
	python -m umgap_tpu taxa2freq -r "$rank" -f "$freq" \
		"$configdir/taxons.tsv" "$@"
	;;
html)
	cat "$@" | python -m umgap_tpu taxa2tree
	;;
url)
	cat "$@" | python -m umgap_tpu taxa2tree -u
	;;
esac
