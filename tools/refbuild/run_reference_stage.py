#!/usr/bin/env python3
"""Drive the reference ViralQuasispecies binary through one SAVAGE stage.

Python-3 port of the reference's scripts/pipeline_per_stage.py control flow
(the reference script is Python 2), used ONLY to produce golden outputs for
parity testing of haploconduct_tpu. Flags passed to the binary are byte-for-
byte those of pipeline_per_stage.py run_error_correction / run_merging_it /
run_clique_it / run_first_it_merge.

Usage: run_reference_stage.py --workdir DIR --stage a --fastq input_fas \
           --overlaps original_overlaps.txt --min_overlap_len 200 ...
"""

import argparse
import os
import shutil
import subprocess
import sys

BASE = os.path.dirname(os.path.abspath(__file__))
VQ = os.path.join(BASE, "bin", "ViralQuasispecies")


def fastq_count(path):
    if not os.path.isfile(path):
        return 0
    with open(path) as f:
        return sum(1 for _ in f) // 4


def analyze_overlaps(path):
    if not os.path.isfile(path):
        return 0
    n = 0
    with open(path) as f:
        for line in f:
            if len(line.strip().split("\t")) >= 13:
                n += 1
    return n


def get_edge_count():
    if not os.path.isfile("graph.txt"):
        return -2
    with open("graph.txt") as f:
        return sum(1 for _ in f) - 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--stage", required=True)
    ap.add_argument("--fastq", required=True, help="dir with singles/paired1/paired2.fastq (relative to workdir)")
    ap.add_argument("--overlaps", required=True)
    ap.add_argument("--min_overlap_len", type=int, default=150)
    ap.add_argument("--min_overlap_perc", type=int, default=0)
    ap.add_argument("--edge_threshold", type=float, default=0.995)
    ap.add_argument("--merge_contigs", type=float, default=0)
    ap.add_argument("--use_subreads", action="store_true")
    ap.add_argument("--num_threads", type=int, default=1)
    ap.add_argument("--remove_branches", default="false")
    ap.add_argument("--min_read_len", type=int, default=0)
    ap.add_argument("--diploid", action="store_true")
    ap.add_argument("--max_tip_len", type=int, required=True)
    ap.add_argument("--clique_size_EC", type=int, default=4)
    ap.add_argument("--min_overlap_len_EC", type=int)
    ap.add_argument("--no_error_correction", dest="error_correction", action="store_false")
    ap.add_argument("--copyfiles", action="store_true", help="snapshot per-iteration outputs")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    os.chdir(args.workdir)
    state = dict(iteration=0)
    verbose = "true" if args.verbose else "false"
    diploid = "true" if args.diploid else "false"
    stage_a = args.stage == "a"
    ctx = dict(
        separate_tips="false" if stage_a else "true",
        remove_inclusions="false" if stage_a else "true",
    )

    if args.use_subreads:
        max_id = 0
        with open("subreads.txt") as f:
            for line in f:
                for sub in line.strip("\n").split("\t")[1:]:
                    max_id = max(max_id, int(sub.split(":")[0]))
        original_readcount = max_id + 1
    elif stage_a:
        original_readcount = fastq_count(f"{args.fastq}/paired1.fastq") + fastq_count(f"{args.fastq}/singles.fastq")
    else:
        original_readcount = fastq_count(f"{args.fastq}/singles.fastq")

    first_it = "false" if args.use_subreads else "true"
    read_counts = [original_readcount] if stage_a else []
    overlap_counts = [analyze_overlaps(args.overlaps)]
    edge_counts = [1]
    mol_ec = args.min_overlap_len_EC if args.min_overlap_len_EC else args.min_overlap_len

    for fname in ("pipeline.log", "stats.txt", "removed_tip_sequences.fastq"):
        open(fname, "w").close()

    def run_vq(flags):
        state["iteration"] += 1
        subprocess.check_call([VQ] + flags)
        if args.copyfiles:
            it = state["iteration"]
            for fname in ("singles.fastq", "overlaps.txt", "subreads.txt",
                          "paired1.fastq", "paired2.fastq", "cliques.txt", "graph.txt"):
                if os.path.isfile(fname):
                    shutil.copy(fname, f"it{it}_{fname}")
        singles = fastq_count("singles.fastq")
        paired = fastq_count("paired1.fastq")
        read_counts.append(singles + paired)
        overlap_counts.append(analyze_overlaps("overlaps.txt"))
        edge_counts.append(get_edge_count())
        print(f"  it{state['iteration']}: reads={singles + paired} "
              f"overlaps={overlap_counts[-1]} edges={edge_counts[-1]}", flush=True)

    def common_flags(edge_threshold, min_overlap_len, keep_singletons, error_rate):
        return [
            "--threads=%d" % args.num_threads,
            "--edge_threshold=%f" % edge_threshold,
            "--keep_singletons=%d" % keep_singletons,
            "--min_overlap_perc=%d" % args.min_overlap_perc,
            "--min_overlap_len=%d" % min_overlap_len,
            "--merge_contigs=%f" % error_rate,
            "--original_readcount=%d" % original_readcount,
            "--verbose=%s" % verbose,
            "--base_path=%s" % BASE,
            "--min_read_len=%s" % args.min_read_len,
            "--max_tip_len=%s" % args.max_tip_len,
            "--separate_tips=%s" % ctx["separate_tips"],
            "--ignore_inclusions=%s" % ctx["remove_inclusions"],
        ]

    def run_error_correction():
        run_vq([
            "--singles", f"{args.fastq}/singles.fastq",
            "--paired1", f"{args.fastq}/paired1.fastq",
            "--paired2", f"{args.fastq}/paired2.fastq",
            "--overlaps=%s" % args.overlaps,
            "--first_it=%s" % first_it,
            "--cliques=true",
            "--error_correction=true",
            "--min_clique_size=%d" % args.clique_size_EC,
            "--remove_branches=false",
            "--FNO=3",
            "--remove_trans=2",
            "--optimize=false",
        ] + common_flags(args.edge_threshold, mol_ec, 1000, args.merge_contigs))

    def run_first_it_merge():
        ks = max(args.min_overlap_len, args.min_read_len)
        run_vq([
            "--singles=%s/singles.fastq" % args.fastq,
            "--overlaps=%s" % args.overlaps,
            "--first_it=%s" % first_it,
            "--min_clique_size=2",
            "--remove_branches=true",
            "--FNO=1",
            "--error_correction=false",
            "--remove_trans=1",
            "--optimize=false",
            "--diploid=%s" % diploid,
        ] + common_flags(args.edge_threshold, args.min_overlap_len, ks, args.merge_contigs))

    def run_merging_it(error_rate):
        ks = max(args.min_overlap_len, args.min_read_len)
        paired1 = "paired1.fastq" if stage_a else "None"
        paired2 = "paired2.fastq" if stage_a else "None"
        run_vq([
            "--singles", "singles.fastq",
            "--paired1=%s" % paired1,
            "--paired2=%s" % paired2,
            "--overlaps=overlaps.txt",
            "--first_it=false",
            "--min_clique_size=2",
            "--remove_branches=true",
            "--FNO=1",
            "--error_correction=false",
            "--remove_trans=1",
            "--optimize=false",
            "--diploid=%s" % diploid,
        ] + common_flags(args.edge_threshold, args.min_overlap_len, ks, error_rate))

    def run_clique_it(error_rate):
        ks = max(args.min_overlap_len, args.min_read_len)
        paired1 = "paired1.fastq" if stage_a else "None"
        paired2 = "paired2.fastq" if stage_a else "None"
        run_vq([
            "--singles", "singles.fastq",
            "--paired1=%s" % paired1,
            "--paired2=%s" % paired2,
            "--overlaps=overlaps.txt",
            "--first_it=false",
            "--cliques=true",
            "--error_correction=false",
            "--min_clique_size=2",
            "--remove_branches=false",
            "--FNO=3",
            "--remove_trans=1",
            "--optimize=false",
            "--diploid=%s" % diploid,
        ] + common_flags(args.edge_threshold, args.min_overlap_len, ks, error_rate))

    error_rate_loop = args.merge_contigs if args.stage == "c" else 0.0
    if stage_a and args.error_correction:
        run_error_correction()
        ctx["remove_inclusions"] = "true"
        ctx["separate_tips"] = "true"
    else:
        run_first_it_merge()

    const_read_its = 0
    while overlap_counts[-1] > 0 and edge_counts[-1] > 0 and const_read_its < 2:
        while overlap_counts[-1] > 0 and edge_counts[-1] > 0 and const_read_its < 2:
            run_merging_it(error_rate_loop)
            const_read_its = const_read_its + 1 if read_counts[-1] == read_counts[-2] else 0
        if args.remove_branches == "false":
            run_clique_it(error_rate_loop)
            const_read_its = const_read_its + 1 if read_counts[-1] == read_counts[-2] else 0

    print(f"Stage {args.stage} done in {state['iteration']} iterations")
    print("read counts:", read_counts)
    print("overlap counts:", overlap_counts)
    print("edge counts:", edge_counts)


if __name__ == "__main__":
    sys.exit(main())
