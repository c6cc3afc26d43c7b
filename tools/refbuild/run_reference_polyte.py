#!/usr/bin/env python3
"""Drive the reference ViralQuasispecies binary through the POLYTE
iteration scheme (reference polyte.py run_savage_assembly, polyte.py:574-
751), for parity testing of haploconduct_tpu's polyte workflow.

The reference recomputes candidate overlaps on the contigs after every
iteration with rust-overlaps (polyte.py:739-746), which does not exist in
this environment — both pipelines instead use haploconduct_tpu's k-mer
candidate engine (exact mode, sfo_err=0), so any output divergence is the
assembly core's, not the candidate generator's.

Usage: run_reference_polyte.py --workdir DIR --fastq s_p1_p2.fastq \
           --min_overlap_len 50 --min_overlap_len_EC 80 --hap_cov 14 ...
Expects original_overlaps.txt (+ evidence_threshold_table.tsv when
hap_cov > 0) already in the workdir.
"""

import argparse
import os
import shutil
import subprocess
import sys

BASE = os.path.dirname(os.path.abspath(__file__))
VQ = os.path.join(BASE, "bin", "ViralQuasispecies")
sys.path.insert(0, os.path.join(BASE, "..", ".."))


def fastq_count(path):
    if not os.path.isfile(path):
        return 0
    with open(path) as f:
        return sum(1 for _ in f) // 4


def get_edge_count():
    if not os.path.isfile("graph.txt"):
        return -2
    with open("graph.txt") as f:
        return sum(1 for _ in f) - 2


def overlap_count(path):
    if not os.path.isfile(path):
        return 0
    with open(path) as f:
        return sum(1 for line in f if len(line.split("\t")) >= 13)


def recompute_overlaps(min_overlap_len, kmer_k):
    """The reference's per-iteration rust-overlaps run on the contigs
    (polyte.py:739-746), replaced by the shared k-mer candidate engine."""
    from haploconduct_tpu.core.reads import ReadStore
    from haploconduct_tpu.io.overlaps import write_overlaps
    from haploconduct_tpu.workflows.polyte import single_end_candidates

    if fastq_count("singles.fastq") == 0:
        open("overlaps.txt", "w").close()
        return
    store = ReadStore.from_files(singles="singles.fastq")
    ov = single_end_candidates(store, min_overlap_len, 0.0, kmer_k)
    write_overlaps("overlaps.txt", ov)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--fastq", default="s_p1_p2.fastq")
    ap.add_argument("--overlaps", default="original_overlaps.txt")
    ap.add_argument("--min_overlap_len", type=int, default=50)
    ap.add_argument("--min_overlap_len_EC", type=int, required=True)
    ap.add_argument("--min_clique_size", type=int, default=3)
    ap.add_argument("--min_read_len", type=int, default=0)
    ap.add_argument("--max_tip_len", type=int, required=True)
    ap.add_argument("--hap_cov", type=float, default=0.0)
    ap.add_argument("--branch_SE_c", type=int, default=0)
    ap.add_argument("--branch_PE_c", type=int, default=0)
    ap.add_argument("--original_fastq", default="")
    ap.add_argument("--error_rate", type=float, default=0.0)
    ap.add_argument("--diploid", action="store_true")
    ap.add_argument("--no_EC", dest="EC", action="store_false")
    ap.add_argument("--use_subreads", action="store_true",
                    help="subreads.txt present (diploid round 2 carry-over)")
    ap.add_argument("--readcount", type=int, required=True,
                    help="original readcount (branch evidence ID space)")
    ap.add_argument("--kmer_k", type=int, default=20)
    ap.add_argument("--copyfiles", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    os.chdir(args.workdir)
    verbose = "true" if args.verbose else "false"
    diploid = "true" if args.diploid else "false"
    state = dict(iteration=0)

    for fname in ("pipeline.log", "stats.txt", "removed_tip_sequences.fastq"):
        open(fname, "w").close()

    read_counts = [args.readcount]
    overlap_counts = [overlap_count(args.overlaps)]
    edge_counts = [1]

    def run_vq(fastq, overlaps, min_overlap_len, next_min_overlap, *,
               first_it, cliques, EC, branch_red, min_clique_size,
               edge_threshold, final_it):
        state["iteration"] += 1
        if EC:
            keep_singletons = 1000
        elif args.diploid and final_it:
            keep_singletons = args.max_tip_len
        else:
            keep_singletons = 0
        remove_trans = 2 if EC else 1
        hap_cov = args.hap_cov if branch_red else 0.0
        if (not cliques) or (not EC and hap_cov == 0):
            remove_branches = "true"
        else:
            remove_branches = "false"
        cmd = [VQ,
               "--singles=%s" % fastq,
               "--overlaps=%s" % overlaps,
               "--threads=1",
               "--edge_threshold=%f" % edge_threshold,
               "--first_it=%s" % ("true" if first_it else "false"),
               "--cliques=%s" % ("true" if cliques else "false"),
               "--error_correction=%s" % ("true" if EC else "false"),
               "--keep_singletons=%d" % keep_singletons,
               "--min_clique_size=%d" % min_clique_size,
               "--remove_branches=%s" % remove_branches,
               "--remove_tips=false",
               "--min_overlap_len=%d" % min_overlap_len,
               "--merge_contigs=%f" % args.error_rate,
               "--FNO=1",
               "--original_readcount=%d" % args.readcount,
               "--remove_trans=%d" % remove_trans,
               "--optimize=false",
               "--verbose=%s" % verbose,
               "--base_path=%s" % BASE,
               "--min_read_len=%s" % args.min_read_len,
               "--max_tip_len=%s" % args.max_tip_len,
               "--separate_tips=%s" % ("true" if final_it else "false"),
               "--ignore_inclusions=%s" % ("true" if (final_it and args.diploid) else "false"),
               "--diploid=%s" % diploid,
               "--min_qual=0"]
        if hap_cov > 0:
            cmd += ["--branch_reduction=true",
                    "--original_fastq=%s" % args.original_fastq,
                    "--branch_SE_c=%s" % args.branch_SE_c,
                    "--branch_PE_c=%s" % args.branch_PE_c]
        subprocess.check_call(cmd)
        recompute_overlaps(next_min_overlap, args.kmer_k)
        if args.copyfiles:
            it = state["iteration"]
            for fname in ("singles.fastq", "overlaps.txt", "subreads.txt"):
                if os.path.isfile(fname):
                    shutil.copy(fname, f"it{it}_{fname}")
        read_counts.append(fastq_count("singles.fastq"))
        overlap_counts.append(overlap_count("overlaps.txt"))
        edge_counts.append(get_edge_count())
        print(f"  it{state['iteration']}: reads={read_counts[-1]} "
              f"overlaps={overlap_counts[-1]} edges={edge_counts[-1]}", flush=True)

    # ---- first iteration (polyte.py:598-613)
    if args.EC:
        run_vq(args.fastq, args.overlaps, args.min_overlap_len_EC,
               args.min_overlap_len, first_it=True, cliques=True, EC=True,
               branch_red=False, min_clique_size=args.min_clique_size,
               edge_threshold=0.95, final_it=False)
    elif args.diploid:
        run_vq(args.fastq, args.overlaps, args.min_overlap_len,
               args.min_overlap_len, first_it=False, cliques=True, EC=False,
               branch_red=args.hap_cov > 0,
               min_clique_size=args.min_clique_size,
               edge_threshold=1.0, final_it=False)
    else:
        run_vq(args.fastq, args.overlaps, args.min_overlap_len_EC,
               args.min_overlap_len, first_it=True, cliques=True, EC=False,
               branch_red=False, min_clique_size=args.min_clique_size,
               edge_threshold=0.95, final_it=False)

    # ---- convergence loop (polyte.py:616-640)
    const_read_its = 0
    while read_counts[-1] > 0 and overlap_counts[-1] > 0 and \
            edge_counts[-1] > 0 and const_read_its < 2:
        while read_counts[-1] > 0 and overlap_counts[-1] > 0 and \
                edge_counts[-1] > 0 and const_read_its < 2:
            run_vq("singles.fastq", "overlaps.txt", args.min_overlap_len,
                   args.min_overlap_len, first_it=False, cliques=False,
                   EC=False, branch_red=False, min_clique_size=2,
                   edge_threshold=1.0, final_it=False)
            const_read_its = const_read_its + 1 \
                if read_counts[-1] == read_counts[-2] else 0
        # the reference runs the BranchReduction iteration unconditionally
        # after the inner merge loop (polyte.py:631-640)
        run_vq("singles.fastq", "overlaps.txt", args.min_overlap_len,
               args.min_overlap_len, first_it=False, cliques=True, EC=False,
               branch_red=args.hap_cov > 0, min_clique_size=2,
               edge_threshold=1.0, final_it=False)
        const_read_its = const_read_its + 1 \
            if read_counts[-1] == read_counts[-2] else 0

    # ---- final cleanup iteration (polyte.py:660-666)
    if read_counts[-1] > 0:
        run_vq("singles.fastq", "overlaps.txt", args.min_overlap_len,
               args.min_overlap_len, first_it=False, cliques=False, EC=False,
               branch_red=False, min_clique_size=2, edge_threshold=1.0,
               final_it=True)

    print(f"POLYTE reference run done in {state['iteration']} iterations")
    print("read counts:", read_counts)


if __name__ == "__main__":
    main()
