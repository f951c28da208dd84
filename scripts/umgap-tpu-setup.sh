#!/bin/sh
# Configure umgap_tpu: create the config/data directories and install
# the taxonomy and index artifacts (versioned, symlinked).
#
# Thin wrapper over `umgap-tpu setup` (umgap_tpu/configdir.py), the
# counterpart of the reference's umgap-setup.sh
# (/root/reference/scripts/umgap-setup.sh). Without -T/-n/-p it
# negotiates the latest version with the data server (needs network);
# with local files it performs an offline install.
set -e

usage() {
	cat <<USAGE
Usage: $0 [-c configdir] [-d datadir] [-v version] [-y]
          [-T taxons.tsv] [-n ninemer.npz] [-p tryptic.npz]
  -T/-n/-p  local artifact files to install offline (needs -v)
  -v ver    data version label (default: ask the data server)
  -c/-d     config / data directories (default: XDG discovery)
  -y        non-interactive; download everything missing
USAGE
	exit 1
}

args=""
while getopts c:d:v:T:n:p:yh opt; do
	case "$opt" in
	c) args="$args -c $OPTARG" ;;
	d) args="$args -d $OPTARG" ;;
	v) args="$args -v $OPTARG" ;;
	T) args="$args --taxons $OPTARG" ;;
	n) args="$args --ninemer $OPTARG" ;;
	p) args="$args --tryptic $OPTARG" ;;
	y) args="$args -y" ;;
	*) usage ;;
	esac
done

exec python -m umgap_tpu setup $args
