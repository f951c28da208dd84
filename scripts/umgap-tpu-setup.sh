#!/bin/sh
# Configure umgap_tpu: create the config directory and install the
# taxonomy and index artifacts.
#
# Counterpart of the reference's umgap-setup.sh
# (/root/reference/scripts/umgap-setup.sh), which downloads Unipept's
# taxons.tsv and FST indices. Index artifacts here are packed .npz
# tables; build them from Unipept TSV dumps with `umgap-tpu buildindex`
# or the fast native path, or point this script at prebuilt files.
set -e

usage() {
	cat <<EOF
Usage: $0 [-c configdir] -T taxons.tsv [-n ninemer.index.npz] [-p tryptic.index.npz]
  -T file   the Unipept taxonomy TSV (required)
  -n file   a 9-mer index built with 'umgap-tpu buildindex' (optional)
  -p file   a tryptic index (optional)
  -c dir    config directory (default: \$XDG_CONFIG_HOME/umgap-tpu or ~/.config/umgap-tpu)
EOF
	exit 1
}

configdir=""
while getopts c:T:n:p:h opt; do
	case "$opt" in
	c) configdir="$OPTARG" ;;
	T) taxons="$OPTARG" ;;
	n) ninemer="$OPTARG" ;;
	p) tryptic="$OPTARG" ;;
	*) usage ;;
	esac
done
[ -n "$taxons" ] || usage

if [ -z "$configdir" ]; then
	if [ -n "$XDG_CONFIG_HOME" ]; then configdir="$XDG_CONFIG_HOME/umgap-tpu"
	else configdir="$HOME/.config/umgap-tpu"; fi
fi
mkdir -p "$configdir"

install_file() { # src dst
	[ -n "$1" ] || return 0
	[ -r "$1" ] || { echo "cannot read $1" >&2; exit 2; }
	ln -sf "$(realpath "$1")" "$configdir/$2"
	echo "installed $configdir/$2"
}

install_file "$taxons" taxons.tsv
install_file "$ninemer" ninemer.index.npz
install_file "$tryptic" tryptic.index.npz
echo "umgap_tpu configured in $configdir"
