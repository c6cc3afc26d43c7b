#!/usr/bin/env python3
"""Reference-binary parity AND side-by-side wall-clock on ONE envelope patch.

Rebuilds one 44k-read patch of the SAVAGE 10,000x envelope workload
(tools/envelope_run.py savage_envelope, byte-identical data generation),
feeds the SAME candidate overlaps to both the reference ViralQuasispecies
binary (driven by tools/refbuild/run_reference_stage.py, the Python-3 port
of /root/reference/scripts/pipeline_per_stage.py:146-198) and our stage-a
driver, then

  (a) asserts byte-identical per-iteration fastq/subreads/overlaps —
      bit-identity at ~18x the savage/example parity scale;
  (b) records both wall-clocks (reference binary gets --num_threads =
      host cores; ours runs the production native backend);
  (c) reports both stage-a contig counts, settling whether the envelope's
      491-978 contigs/patch is the algorithm or the rebuild.

Usage: python tools/envelope_patch_parity.py [--patch 0] [--workdir DIR]
           [--backend native] [--skip-reference]
Prints one JSON line; recorded in BASELINE.md's envelope table.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFBUILD = os.path.join(REPO, "tools", "refbuild")

import numpy as np


def build_patch(patch_idx: int, split_num: int = 15):
    """Patch `patch_idx` of the envelope workload — same seeds/params as
    tools/envelope_run.py savage_envelope (genome 10kb, 4 strains @ 3%
    divergence, 10,000x total, 150bp reads @ 0.2% error)."""
    from haploconduct_tpu.utils.simulate import (mutate_sequence,
                                                 random_genome,
                                                 simulate_reads)
    from haploconduct_tpu.workflows.savage import split_into_patches
    from envelope_run import make_store

    rng = np.random.default_rng(0)
    genome = random_genome(rng, 10000)
    haps = [genome] + [mutate_sequence(genome, rng, sub_rate=0.03)
                       for _ in range(3)]
    seqs, quals = simulate_reads(haps, coverage=10000 / 4, read_len=150,
                                 rng=rng, error_rate=0.002)
    store = make_store(seqs, quals)
    pstore, _ = split_into_patches(store, split_num, False)[patch_idx]
    return pstore


def write_input_fas(pstore, fas_dir: str) -> None:
    os.makedirs(fas_dir, exist_ok=True)
    with open(os.path.join(fas_dir, "singles.fastq"), "w") as f:
        for i in range(len(pstore)):
            f.write(f"@{i}\n{pstore.seq_str(i)}\n+\n{pstore.phred_str(i)}\n")
    for name in ("paired1.fastq", "paired2.fastq"):
        open(os.path.join(fas_dir, name), "w").close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--patch", type=int, default=0)
    ap.add_argument("--split", type=int, default=15,
                    help="patch count (15 = the envelope; higher = smaller "
                         "patches, for smoke tests)")
    ap.add_argument("--workdir", default="/tmp/envelope_patch_parity")
    ap.add_argument("--backend", default="native")
    ap.add_argument("--skip-reference", action="store_true",
                    help="only run and time our stage (no binary, no diff)")
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 1)
    args = ap.parse_args()

    from test_reference_parity import build_reference_binary
    from parity_debug import compare_iteration

    from haploconduct_tpu.assemble.stages import StageParams, run_stage
    from haploconduct_tpu.io.overlaps import write_overlaps
    from haploconduct_tpu.workflows.savage import denovo_candidates

    t0 = time.time()
    pstore = build_patch(args.patch, args.split)
    print(f"[patch {args.patch}] {len(pstore)} reads "
          f"({time.time() - t0:.0f}s to build)", file=sys.stderr, flush=True)

    # candidates: exactly run_savage's per-patch call (min_overlap_len =
    # 0.6 * 150 = 90, sfo_mm 50, k 20)
    t0 = time.time()
    overlaps = denovo_candidates(pstore, 90, 50, 20)
    t_cand = time.time() - t0
    print(f"[patch {args.patch}] {len(overlaps)} candidates in {t_cand:.0f}s",
          file=sys.stderr, flush=True)

    work = os.path.abspath(args.workdir)
    if os.path.exists(work):
        shutil.rmtree(work)
    refdir = os.path.join(work, "ref")
    stage_dir = os.path.join(refdir, "stage_a")
    ourdir = os.path.join(work, "ours")
    os.makedirs(stage_dir)
    os.makedirs(ourdir)
    write_input_fas(pstore, os.path.join(refdir, "input_fas"))
    t0 = time.time()
    write_overlaps(os.path.join(refdir, "original_overlaps.txt"), overlaps)
    print(f"[ref] wrote overlaps in {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)

    # --- ours (production backend), with per-iteration snapshots
    params = StageParams(stage="a", min_overlap_len=90, edge_threshold=0.97,
                         remove_branches=True, max_tip_len=150,
                         original_readcount=len(pstore),
                         backend=args.backend, dump_dir=ourdir)
    t0 = time.time()
    res = run_stage(params, pstore, overlaps)
    t_ours = time.time() - t0
    print(f"[ours] {res.iterations} iterations, {len(res.store)} contigs, "
          f"{t_ours:.1f}s (incl. per-iteration snapshots)",
          file=sys.stderr, flush=True)

    out = {
        "metric": "envelope-patch stage-a parity vs reference binary",
        "patch": args.patch,
        "n_reads": len(pstore),
        "n_candidates": int(len(overlaps)),
        "candidates_s": round(t_cand, 1),
        "ours_backend": args.backend,
        "ours_wall_s": round(t_ours, 1),
        "ours_iterations": res.iterations,
        "ours_contigs": len(res.store),
    }
    if args.skip_reference:
        print(json.dumps(out))
        return 0

    # --- reference binary, --num_threads = host cores (its OpenMP verify
    # loop, EdgeCalculator.cpp:395-423, gets the full host)
    build_reference_binary()
    t0 = time.time()
    subprocess.check_call([
        sys.executable, os.path.join(REFBUILD, "run_reference_stage.py"),
        "--workdir", stage_dir, "--stage", "a",
        "--fastq", "../input_fas", "--overlaps", "../original_overlaps.txt",
        "--min_overlap_len", "90", "--remove_branches", "true",
        "--max_tip_len", "150", "--edge_threshold", "0.97",
        "--clique_size_EC", "4", "--num_threads", str(args.threads),
        "--copyfiles"])
    t_ref = time.time() - t0
    ref_contigs = 0
    with open(os.path.join(stage_dir, "singles.fastq")) as f:
        ref_contigs = sum(1 for _ in f) // 4
    print(f"[ref] {t_ref:.1f}s, {ref_contigs} contigs",
          file=sys.stderr, flush=True)

    # --- per-iteration byte diff (parity_debug.compare_iteration)
    first_diff = None
    it = 1
    while True:
        ref_snap = os.path.join(stage_dir, f"it{it}_singles.fastq")
        our_snap = os.path.join(ourdir, f"it{it}_singles.fastq")
        if not os.path.exists(ref_snap) and not os.path.exists(our_snap):
            break
        if os.path.exists(ref_snap) and not os.path.exists(our_snap):
            # the reference's 0-edge terminating iteration exits early and
            # leaves its INPUT files on disk (ViralQuasispecies.cpp:284-291
            # deletes only graph.txt), so its itN snapshot is the previous
            # iteration's state; our driver records no snapshot for the
            # terminated iteration. Compare ref itN against our it(N-1).
            import shutil as _sh

            for fname in ("singles.fastq", "paired1.fastq", "subreads.txt",
                          "overlaps.txt"):
                prev = os.path.join(ourdir, f"it{it - 1}_{fname}")
                if os.path.exists(prev):
                    _sh.copy(prev, os.path.join(ourdir, f"it{it}_{fname}"))
        diffs = compare_iteration(stage_dir, ourdir, it)
        if diffs:
            print(f"=== it{it} DIVERGES ===", file=sys.stderr)
            for d in diffs:
                print("  " + d, file=sys.stderr)
            if first_diff is None:
                first_diff = it
        else:
            print(f"it{it}: identical", file=sys.stderr, flush=True)
        it += 1

    out.update({
        "reference_wall_s": round(t_ref, 1),
        "reference_threads": args.threads,
        "reference_contigs": ref_contigs,
        "iterations_compared": it - 1,
        "first_divergence": first_diff,
        "bit_identical": first_diff is None,
    })
    print(json.dumps(out))
    return 0 if first_diff is None else 1


if __name__ == "__main__":
    sys.exit(main())
