#!/usr/bin/env python3
"""Per-iteration POLYTE parity diff: reference binary vs haploconduct_tpu.

Runs polyte/example (2,949 pairs, diploid HIV mix) through both pipelines
with identical candidate overlaps at every iteration (both sides use the
k-mer candidate engine in exact mode) and reports the first divergence.

Usage: python tools/polyte_parity_debug.py [workdir] [--diploid]
"""

import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

EXAMPLE = "/root/reference/polyte/example/input"
REFBUILD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refbuild")

HAP_COV, INSERT, STDDEV = 14.0, 486.6, 146.7


def read_lines(path):
    if not os.path.isfile(path):
        return []
    with open(path) as f:
        return f.read().splitlines()


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/polyte_dbg"
    diploid = "--diploid" in sys.argv
    from test_reference_parity import build_reference_binary
    build_reference_binary()

    from haploconduct_tpu.core.reads import ReadStore
    from haploconduct_tpu.io.overlaps import write_overlaps
    from haploconduct_tpu.io.fastq import write_fastq
    from haploconduct_tpu.workflows.polyte import (
        PolyteConfig, concat_to_single_end, single_end_candidates, run_polyte,
        _AssemblyLoop)
    from haploconduct_tpu.workflows.min_ev_table import (
        build_threshold_table, format_table)
    from haploconduct_tpu.utils.checkpoint import save_state
    from haploconduct_tpu.io.subreads import subreads_to_text

    os.makedirs(workdir, exist_ok=True)
    store = ReadStore.from_files(paired1=f"{EXAMPLE}/forward.fastq",
                                 paired2=f"{EXAMPLE}/reverse.fastq")
    single_store = concat_to_single_end(store)
    n = len(single_store)
    total_len = sum(single_store.unit_len(u) for u in range(single_store.n_units))
    avg_len = total_len / n
    mol_ec = int(round(2 + 0.5 * avg_len))
    max_tip_len = int(round(avg_len))
    SE_count, PE_count = 0, n
    intseg = INSERT - 2 * avg_len
    print(f"{n} single-end reads, avg len {avg_len:.1f}, mol_EC {mol_ec}, "
          f"max_tip_len {max_tip_len}")

    overlaps = single_end_candidates(single_store, mol_ec, 0.02, 20)
    print(f"{len(overlaps)} candidate overlaps")

    # --- reference side
    refdir = os.path.join(workdir, "ref")
    os.makedirs(refdir, exist_ok=True)
    ids = [int(single_store.ids[i]) for i in range(n)]
    write_fastq(os.path.join(refdir, "s_p1_p2.fastq"), ids,
                [single_store.seq_str(i, 0) for i in range(n)],
                [single_store.phred_str(i, 0) for i in range(n)])
    write_overlaps(os.path.join(refdir, "original_overlaps.txt"), overlaps)
    table = build_threshold_table(avg_len, intseg, STDDEV, HAP_COV)
    with open(os.path.join(refdir, "evidence_threshold_table.tsv"), "w") as f:
        f.write(format_table(table, avg_len, intseg, STDDEV, HAP_COV))
    subprocess.check_call([
        sys.executable, os.path.join(REFBUILD, "run_reference_polyte.py"),
        "--workdir", refdir,
        "--min_overlap_len", "50", "--min_overlap_len_EC", str(mol_ec),
        "--min_clique_size", "3", "--max_tip_len", str(max_tip_len),
        "--hap_cov", str(HAP_COV), "--branch_SE_c", str(SE_count),
        "--branch_PE_c", str(PE_count // 2),
        "--original_fastq", os.path.join(refdir, "s_p1_p2.fastq"),
        "--readcount", str(SE_count + PE_count), "--copyfiles"])

    # --- our side, with per-iteration dumps
    ourdir = os.path.join(workdir, "ours")
    os.makedirs(ourdir, exist_ok=True)
    cfg = PolyteConfig(hap_cov=HAP_COV, insert_size=INSERT, stddev=STDDEV,
                       diploid=diploid, backend="numpy")
    thresholds = table
    loop = _AssemblyLoop(cfg, single_store, thresholds, SE_count, PE_count,
                         SE_count + PE_count, max_tip_len, mol_ec)

    # wrap run_iteration dumps via monkeypatched step? simpler: re-drive the
    # loop and snapshot through loop.history hook — instead we dump inside
    # a wrapper around run_iteration
    import haploconduct_tpu.workflows.polyte as polyte_mod
    real_run_iteration = polyte_mod.run_iteration
    counter = dict(it=0)

    def dumping_run_iteration(*a, **kw):
        res = real_run_iteration(*a, **kw)
        counter["it"] += 1
        it = counter["it"]
        if not res.terminated:
            d = os.path.join(ourdir, "snap")
            save_state(d, res.store, res.subreads, None)
            for fname in ("singles.fastq", "subreads.txt"):
                src = os.path.join(d, fname)
                if os.path.exists(src):
                    os.replace(src, os.path.join(ourdir, f"it{it}_{fname}"))
        return res

    polyte_mod.run_iteration = dumping_run_iteration
    try:
        final_store, final_sub = loop.run(
            single_store, overlaps, None, EC=True, diploid=False,
            min_overlap_len=50, min_clique_size=3, error_rate=0.0)
        if diploid and final_store is not None and len(final_store) > 0:
            dip_overlaps = single_end_candidates(final_store, 50, 0.0, 20)
            # reference side: fresh 'diploid' dir seeded with the main
            # round's contigs + subreads (polyte.py:376-416)
            dipdir = os.path.join(workdir, "ref_dip")
            os.makedirs(dipdir, exist_ok=True)
            shutil.copy(os.path.join(refdir, "singles.fastq"),
                        os.path.join(dipdir, "s_p1_p2.fastq"))
            shutil.copy(os.path.join(refdir, "subreads.txt"),
                        os.path.join(dipdir, "subreads.txt"))
            shutil.copy(os.path.join(refdir, "evidence_threshold_table.tsv"),
                        os.path.join(dipdir, "evidence_threshold_table.tsv"))
            write_overlaps(os.path.join(dipdir, "original_overlaps.txt"), dip_overlaps)
            subprocess.check_call([
                sys.executable, os.path.join(REFBUILD, "run_reference_polyte.py"),
                "--workdir", dipdir, "--diploid", "--no_EC", "--use_subreads",
                "--min_overlap_len", "50", "--min_overlap_len_EC", str(mol_ec),
                "--min_clique_size", "2", "--max_tip_len", str(max_tip_len),
                "--hap_cov", str(HAP_COV), "--branch_SE_c", str(SE_count),
                "--branch_PE_c", str(PE_count // 2),
                "--original_fastq", os.path.join(refdir, "s_p1_p2.fastq"),
                "--readcount", str(SE_count + PE_count), "--copyfiles"])
            refdir = dipdir  # compare diploid iterations below
            counter["it"] = 0
            loop2 = _AssemblyLoop(cfg, single_store, thresholds, SE_count,
                                  PE_count, SE_count + PE_count, max_tip_len,
                                  mol_ec)
            ourdir = os.path.join(workdir, "ours_dip")
            os.makedirs(ourdir, exist_ok=True)
            dip_store, dip_sub = loop2.run(
                final_store, dip_overlaps, final_sub, EC=False, diploid=True,
                min_overlap_len=50, min_clique_size=2, error_rate=0.0)
            loop = loop2
            final_store = dip_store
    finally:
        polyte_mod.run_iteration = real_run_iteration
    print(f"ours: {loop.iteration} iterations, "
          f"{len(final_store) if final_store else 0} final contigs")

    # --- compare per iteration
    first_diff = None
    it = 1
    while True:
        ref_f = os.path.join(refdir, f"it{it}_singles.fastq")
        our_f = os.path.join(ourdir, f"it{it}_singles.fastq")
        if not os.path.exists(ref_f) and not os.path.exists(our_f):
            break
        diffs = []
        for fname in ("singles.fastq", "subreads.txt"):
            ref = read_lines(os.path.join(refdir, f"it{it}_{fname}"))
            ours = read_lines(os.path.join(ourdir, f"it{it}_{fname}"))
            if ref != ours:
                same_set = sorted(ref) == sorted(ours)
                diffs.append(f"{fname}: ref={len(ref)} ours={len(ours)} lines"
                             + (" (same content, different order)" if same_set else ""))
                if not same_set:
                    sref, sours = set(ref), set(ours)
                    diffs.append(f"   only_ref={sorted(sref-sours)[:2]}")
                    diffs.append(f"   only_ours={sorted(sours-sref)[:2]}")
        if diffs:
            print(f"=== it{it} DIVERGES ===")
            for d in diffs:
                print("  " + d)
            if first_diff is None:
                first_diff = it
            break  # downstream iterations are meaningless after a diff
        else:
            print(f"it{it}: identical")
        it += 1
    if first_diff is None:
        print("\nALL ITERATIONS IDENTICAL — POLYTE bit parity achieved")
    else:
        print(f"\nfirst divergence at iteration {first_diff}")
    return first_diff


if __name__ == "__main__":
    sys.exit(1 if main() is not None else 0)
