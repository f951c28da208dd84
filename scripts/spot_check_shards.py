"""Per-shard spot-exactness over a (possibly still building) distbuild
workdir: for every COMPLETED shard, reconstruct ground-truth key/value
pairs from random bucket windows via ranged ``items()`` and re-probe
them through the host probe; verify owner-function agreement and random
non-key misses.  Prints one JSON line per shard and a summary.

Usage: python scripts/spot_check_shards.py <workdir> [keys_per_shard=512]
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    workdir = sys.argv[1]
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from umgap_tpu.index.table import load_table
    from umgap_tpu.ops import kmers as kmerops
    from umgap_tpu.parallel.sharded import owner_of

    with open(os.path.join(workdir, "manifest.json")) as f:
        S = json.load(f)["n_shards"]
    rng = np.random.default_rng(17)
    done = sorted(glob.glob(os.path.join(workdir, "shards", "shard_*.done")))
    results = []
    for stamp in done:
        s = int(os.path.basename(stamp)[6:9])
        t0 = time.perf_counter()
        t = load_table(stamp[:-5] + ".npz", mmap=True)
        nb = t.n_buckets
        keys, vals = [], []
        for _ in range(4):
            b0 = int(rng.integers(0, nb - 64))
            p, v = t.items(bucket_range=(b0, b0 + 64))
            keys.append(p)
            vals.append(v)
        keys = np.concatenate(keys)
        vals = np.concatenate(vals)
        sel = rng.permutation(len(keys))[:per]
        qk, qv = keys[sel], vals[sel]
        hi, lo = kmerops.split_packed(qk.astype(np.uint64))
        assert (owner_of(hi, lo, S) == s).all(), f"owner drift shard {s}"
        v, f = t.probe_host(hi, lo)
        exact = bool(f.all() and np.array_equal(v, qv))
        miss = rng.integers(0, 2 ** 45, size=2048).astype(np.uint64)
        miss = miss[~np.isin(miss, keys)]
        mh, ml = kmerops.split_packed(miss)
        mo = owner_of(mh, ml, S) == s
        mv, mf = t.probe_host(mh[mo], ml[mo])
        if mf.any():
            # a random 45-bit draw collides with one of the shard's
            # ~half-billion REAL keys with p ~ n/2^45 per draw — a
            # "found miss" must be verified against actual membership
            # (home-bucket items window) before it counts as a false
            # positive
            from umgap_tpu.index.table import mix_key

            genuine = np.zeros(int(mf.sum()), bool)
            cand = miss[mo][mf]
            cval = mv[mf]
            for i, (k, xv) in enumerate(zip(cand, cval)):
                kh, kl = kmerops.split_packed(np.array([k], np.uint64))
                _, mll = mix_key(kh.astype(np.int32),
                                 kl.astype(np.int32))
                b = int(np.uint32(mll[0]) & np.uint32(nb - 1))
                p, vv = t.items(bucket_range=(max(0, b - 1),
                                              min(nb, b + 2)))
                if b + 2 > nb:  # conveyor wrap lap: displaced to 0
                    p0, v0 = t.items(bucket_range=(0, 1))
                    p = np.concatenate([p, p0])
                    vv = np.concatenate([vv, v0])
                genuine[i] = bool((p == k).any()
                                  and (vv[p == k] == xv).all())
            mf = mf.copy()
            mf[np.flatnonzero(mf)[genuine]] = False
        r = {"shard": s, "n": t.n, "load": round(t.n / t.capacity, 4),
             "stash": int(len(t.stash_val)), "max_probes": t.max_probes,
             "keys_checked": int(len(qk)), "exact": exact,
             "nonkey_miss_ok": bool(not mf.any()),
             "s": round(time.perf_counter() - t0, 1)}
        results.append(r)
        print(json.dumps(r), flush=True)
    ok = all(r["exact"] and r["nonkey_miss_ok"] for r in results)
    print(json.dumps({"shards_checked": len(results), "of": S,
                      "all_exact": ok,
                      "total_keys": sum(r["n"] for r in results),
                      "max_stash": max((r["stash"] for r in results),
                                       default=0)}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
