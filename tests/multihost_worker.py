"""Worker process for the multi-host emulation test.

Runs as one of N processes (CPU backend, 4 virtual devices each) joined
by jax.distributed into one global mesh; computes the sharded pipeline
over a deterministic toy world and (process 0) writes the global result.

Usage: python multihost_worker.py <coord_port> <process_id> <nprocs> <out.npz>
"""

import os
import sys

port, pid, nproc, outfile = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                             sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

from jax.experimental import multihost_utils  # noqa: E402

from umgap_tpu.parallel import (  # noqa: E402
    global_batch,
    make_multihost_pipeline,
    per_host_groups,
    pod_mesh,
)
from umgap_tpu.parallel.multihost import make_multihost_tryptic_pipeline  # noqa: E402
from umgap_tpu.pipeline.tryptic import TRYPTIC_PRESETS  # noqa: E402
from umgap_tpu.pipeline import PRESETS  # noqa: E402

import __graft_entry__ as ge  # noqa: E402

tax, dtax, packed, values = ge._toy_world()
config = PRESETS["max-sensitivity"]._replace(k_max=32)
mesh, step = make_multihost_pipeline(tax, packed, values, 9, config)
assert mesh.devices.size == 4 * nproc

# also exercise the (host, chip) mesh constructor
pmesh = pod_mesh()
assert pmesh.devices.shape == (nproc, 4)

# deterministic global workload: 16 read groups
rng = np.random.default_rng(2)
B, E, L = 16, 2, 48
dna_all = rng.integers(0, 4, size=(B, E, L)).astype(np.uint8)
len_all = np.full((B, E), L, dtype=np.int32)

# per-host ingest: this process only materializes its slice
groups = list(range(B))
mine = per_host_groups(groups, pid, nproc)
local_dna = dna_all[mine[0] : mine[-1] + 1]
local_len = len_all[mine[0] : mine[-1] + 1]

dna, lengths = global_batch(local_dna, local_len, mesh)
taxa, freq = step(dna, lengths)
taxa_full = multihost_utils.process_allgather(taxa, tiled=True)
freq_full = np.asarray(freq)

# the tryptic sharded pipeline across the same 2-process mesh
PEPS = ["AAAAAAAAAK", "CDEFGHILMN", "QQQQSTVWYA", "MSTVWYACDE"]
tconfig = TRYPTIC_PRESETS["tryptic-sensitivity"]._replace(k_max=16)
tmesh, tstep = make_multihost_tryptic_pipeline(
    tax, PEPS, np.array([2, 10239, 12884, 185751], np.int32), tconfig)
tdna, tlen = global_batch(local_dna, local_len, tmesh)
ttaxa, tfreq = tstep(tdna, tlen)
ttaxa_full = multihost_utils.process_allgather(ttaxa, tiled=True)

if pid == 0:
    np.savez(outfile, taxa=np.asarray(taxa_full), freq=freq_full,
             ttaxa=np.asarray(ttaxa_full), tfreq=np.asarray(tfreq))
jax.distributed.shutdown()
