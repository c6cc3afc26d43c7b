#!/usr/bin/env python3
"""Per-iteration parity diff: reference binary vs haploconduct_tpu.

Runs savage/example stage a through BOTH pipelines on identical candidate
overlaps, snapshotting every iteration, then reports the first iteration
where any artifact (read set, overlaps, subreads) diverges.

Usage: python tools/parity_debug.py [workdir] [--ref-guided]
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

EXAMPLE = "/root/reference/savage/example/input_fas"
REFBUILD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refbuild")


def fastq_records(path):
    if not os.path.isfile(path):
        return {}
    recs = {}
    with open(path) as f:
        lines = f.read().splitlines()
    for i in range(0, len(lines) - 3, 4):
        recs[lines[i][1:]] = (lines[i + 1], lines[i + 3])
    return recs


def read_lines(path):
    if not os.path.isfile(path):
        return []
    with open(path) as f:
        return f.read().splitlines()


def compare_iteration(refdir, ourdir, it):
    diffs = []
    for fname in ("singles.fastq", "paired1.fastq", "subreads.txt", "overlaps.txt"):
        ref_p = os.path.join(refdir, f"it{it}_{fname}")
        our_p = os.path.join(ourdir, f"it{it}_{fname}")
        if fname.endswith("fastq"):
            ref, ours = fastq_records(ref_p), fastq_records(our_p)
            if set(ref) != set(ours):
                only_ref = sorted(set(ref) - set(ours))[:5]
                only_our = sorted(set(ours) - set(ref))[:5]
                diffs.append(f"{fname}: ids ref={len(ref)} ours={len(ours)} "
                             f"only_ref={only_ref} only_ours={only_our}")
            else:
                bad = [k for k in ref if ref[k] != ours[k]]
                if bad:
                    k = bad[0]
                    diffs.append(f"{fname}: {len(bad)} records differ; first id {k}:\n"
                                 f"  ref : {ref[k][0][:80]}\n  ours: {ours[k][0][:80]}")
        else:
            ref, ours = read_lines(ref_p), read_lines(our_p)
            if ref != ours:
                same_sorted = sorted(ref) == sorted(ours)
                msg = f"{fname}: ref={len(ref)} ours={len(ours)} lines"
                if same_sorted:
                    msg += " (same content, different ORDER)"
                else:
                    sref, sours = set(ref), set(ours)
                    or_, oo = sorted(sref - sours)[:3], sorted(sours - sref)[:3]
                    msg += f"\n  only_ref={or_}\n  only_ours={oo}"
                diffs.append(msg)
    return diffs


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_dbg"
    from test_reference_parity import build_reference_binary
    build_reference_binary()

    from haploconduct_tpu.core.reads import ReadStore
    from haploconduct_tpu.io.overlaps import write_overlaps
    from haploconduct_tpu.workflows.savage import denovo_candidates
    from haploconduct_tpu.assemble.stages import StageParams, run_stage

    os.makedirs(workdir, exist_ok=True)
    store = ReadStore.from_files(
        singles=f"{EXAMPLE}/singles.fastq",
        paired1=f"{EXAMPLE}/paired1.fastq", paired2=f"{EXAMPLE}/paired2.fastq")
    overlaps = denovo_candidates(store, 200, 50)
    print(f"{len(store)} reads, {len(overlaps)} candidate overlaps")

    # --- reference
    refdir = os.path.join(workdir, "ref")
    stage_dir = os.path.join(refdir, "stage_a")
    os.makedirs(stage_dir, exist_ok=True)
    if not os.path.exists(os.path.join(refdir, "input_fas")):
        import shutil
        shutil.copytree(EXAMPLE, os.path.join(refdir, "input_fas"))
    write_overlaps(os.path.join(refdir, "original_overlaps.txt"), overlaps)
    subprocess.check_call([
        sys.executable, os.path.join(REFBUILD, "run_reference_stage.py"),
        "--workdir", stage_dir, "--stage", "a",
        "--fastq", "../input_fas", "--overlaps", "../original_overlaps.txt",
        "--min_overlap_len", "200", "--remove_branches", "true",
        "--max_tip_len", "415", "--edge_threshold", "0.97",
        "--clique_size_EC", "4", "--copyfiles"])

    # --- ours
    ourdir = os.path.join(workdir, "ours")
    os.makedirs(ourdir, exist_ok=True)
    params = StageParams(stage="a", min_overlap_len=200, edge_threshold=0.97,
                         remove_branches=True, max_tip_len=415,
                         original_readcount=len(store), backend="numpy",
                         dump_dir=ourdir)
    res = run_stage(params, store, overlaps)
    print(f"ours: {res.iterations} iterations, {len(res.store)} final reads")

    # --- compare
    first_diff = None
    for it in range(1, max(res.iterations, 20) + 1):
        if not os.path.exists(os.path.join(refdir, "stage_a", f"it{it}_singles.fastq")) \
           and not os.path.exists(os.path.join(ourdir, f"it{it}_singles.fastq")):
            break
        diffs = compare_iteration(os.path.join(refdir, "stage_a"), ourdir, it)
        if diffs:
            print(f"\n=== it{it}: DIVERGES ===")
            for d in diffs:
                print("  " + d)
            if first_diff is None:
                first_diff = it
        else:
            print(f"it{it}: identical")
    if first_diff is None:
        print("\nALL ITERATIONS IDENTICAL — bit parity achieved")
    else:
        print(f"\nfirst divergence at iteration {first_diff}")


if __name__ == "__main__":
    main()
