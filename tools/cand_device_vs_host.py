"""Device sort-join vs host OpenMP join on SAVAGE-style candidate
generation (VERDICT r3 task 2's measured comparison).

Workloads: the bundled savage/example reads (1x) and the synthetic
10x-scale read set (if its cache exists), both run with the SAVAGE
mismatch-tolerant parameters (error_rate = 1/sfo_mm = 0.02). Reports
wall-clock for each engine plus set agreement (the device join bounds
per-seed expansion at `expand` slots, so at deep coverage it can MISS
candidates whose seed groups exceed that — recall is part of the
honest comparison; the host engine is the exact reference engine).

Usage: python tools/cand_device_vs_host.py [--skip-device]
Prints one JSON line per workload; recorded in docs/CANDIDATES.md.
"""
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from haploconduct_tpu.core.reads import ReadStore
from haploconduct_tpu.ops.kmer import find_overlap_candidates


def sfo_key_set(sfo):
    return set(zip(sfo["ida"].tolist(), sfo["idb"].tolist(),
                   sfo["oha"].tolist(), sfo["ori"].tolist()))


def run_workload(name, seqs, min_ov, error_rate, skip_device):
    t0 = time.perf_counter()
    host = find_overlap_candidates(seqs, min_overlap_len=min_ov, k=20,
                                   error_rate=error_rate)
    t_host = time.perf_counter() - t0

    out = {
        "workload": name,
        "n_seqs": len(seqs),
        "host_s": round(t_host, 2),
        "host_candidates": int(len(host)),
    }
    if not skip_device:
        from haploconduct_tpu.ops.kmer_device import \
            find_overlap_candidates_device

        # warmup/compile
        find_overlap_candidates_device(seqs, min_overlap_len=min_ov,
                                       error_rate=error_rate, verify=False)
        t0 = time.perf_counter()
        dev = find_overlap_candidates_device(seqs, min_overlap_len=min_ov,
                                             error_rate=error_rate,
                                             verify=False)
        t_dev = time.perf_counter() - t0
        hs = sfo_key_set(host)
        ds = sfo_key_set(dev)
        out.update({
            "device_s": round(t_dev, 2),
            "device_candidates": int(len(dev)),
            "device_recall_vs_host": round(len(hs & ds) / max(len(hs), 1), 4),
            "device_extra": int(len(ds - hs)),
        })
    print(json.dumps(out), flush=True)
    return out


def main():
    skip_device = "--skip-device" in sys.argv
    ex = "/root/reference/savage/example/input_fas"
    store = ReadStore.from_files(singles=f"{ex}/singles.fastq",
                                 paired1=f"{ex}/paired1.fastq",
                                 paired2=f"{ex}/paired2.fastq")
    seqs1 = [store.unit_codes(u) for u in range(store.n_units)]
    run_workload("savage/example 1x", seqs1, 100, 1.0 / 50, skip_device)

    cache = "/tmp/profile_stage_cache_10.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            seqs_s, quals, _ = pickle.load(f)
        st = ReadStore()
        for i, (sq, q) in enumerate(zip(seqs_s, quals)):
            st.add_single(i, sq, q)
        st.readcount_single = len(seqs_s)
        seqs10 = [st.unit_codes(u) for u in range(st.n_units)]
        run_workload("synthetic 10x (22k reads)", seqs10, 90, 0.01,
                     skip_device)


if __name__ == "__main__":
    main()
