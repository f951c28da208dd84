#!/bin/sh
# Distributed 9-mer index build job — the counterpart of the
# reference's PBS cluster job (/root/reference/scripts/
# build-index-phanpy.hpc.sh: splitkmers | sort | joinkmers | buildindex
# on a 3-core/200GB node).
#
# Runs the checkpointed multi-process driver: hash-range partition ->
# per-shard sort/join/table-build, every task marked .done so the SAME
# command resumes after any killed worker or driver. Shard count should
# match the serving mesh (parallel/sharded.py uses the same owner
# function, so built shards drop straight into ShardedTable).
#
# Usage: build-index-dist.sh <seqs.tsv> <taxons.tsv> <workdir> [shards] [workers]
set -e

usage() {
	echo "Usage: $0 <sequences.tsv> <taxons.tsv> <workdir> [shards=16] [workers=nproc]" >&2
	exit 1
}

[ $# -ge 3 ] || usage
seqs="$1"; taxons="$2"; workdir="$3"
shards="${4:-16}"
workers="${5:-$(nproc 2>/dev/null || echo 2)}"

exec python -m umgap_tpu buildindex-dist \
	--workdir "$workdir" --tsv "$seqs" --taxons "$taxons" \
	--shards "$shards" --workers "$workers"
