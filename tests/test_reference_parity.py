"""Parity of the full stage-a pipeline against the actual reference binary.

Builds the read-only reference sources (/root/reference) with the boost
shims in tools/refbuild, feeds BOTH pipelines identical candidate overlaps,
and compares the converged contig length profiles. Marked slow: ~3-4 min.

Established behavior (tracked here as a regression bound): on
savage/example the two pipelines converge to contig sets whose top-10
length profiles match almost exactly; small divergences are expected from
clique enumeration order and FNO3 pair-selection order.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REFBUILD = "/root/repo/tools/refbuild"
EXAMPLE = "/root/reference/savage/example/input_fas"

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_SLOW") != "1",
    reason="slow parity test; set RUN_SLOW=1 to run",
)


def build_reference_binary():
    vq = os.path.join(REFBUILD, "bin", "ViralQuasispecies")
    qc = os.path.join(REFBUILD, "quick-cliques", "bin", "qc")
    os.makedirs(os.path.dirname(vq), exist_ok=True)
    os.makedirs(os.path.dirname(qc), exist_ok=True)
    if not os.path.exists(vq):
        subprocess.check_call(
            "g++ -std=c++11 -w -g -O2 -fopenmp -include algorithm -I. "
            "-I/root/reference/src /root/reference/src/*.cpp -o bin/ViralQuasispecies",
            shell=True, cwd=REFBUILD)
    if not os.path.exists(qc):
        srcs = subprocess.check_output(
            "ls /root/reference/quick-cliques/src/*.cpp | grep -v -E 'main|compdegen|printnm'",
            shell=True, text=True).split()
        subprocess.check_call(
            "g++ -w -O2 -std=c++0x -DPRINT_CLIQUES_ONE_BY_ONE -DALLOW_ALLOC_ZERO_BYTES "
            + " ".join(srcs) + " /root/reference/quick-cliques/src/main.cpp -o quick-cliques/bin/qc",
            shell=True, cwd=REFBUILD)
    return vq


def fastq_lengths(path):
    lens = []
    with open(path) as f:
        for i, line in enumerate(f):
            if i % 4 == 1:
                lens.append(len(line.strip()))
    return sorted(lens, reverse=True)


def test_stage_a_parity(tmp_path):
    build_reference_binary()
    from haploconduct_tpu.core.reads import ReadStore
    from haploconduct_tpu.io.overlaps import write_overlaps
    from haploconduct_tpu.workflows.savage import denovo_candidates
    from haploconduct_tpu.assemble.stages import StageParams, run_stage

    store = ReadStore.from_files(
        singles=f"{EXAMPLE}/singles.fastq",
        paired1=f"{EXAMPLE}/paired1.fastq", paired2=f"{EXAMPLE}/paired2.fastq")
    overlaps = denovo_candidates(store, 200, 50)

    # --- reference run
    workdir = tmp_path / "refrun"
    (workdir / "stage_a").mkdir(parents=True)
    shutil.copytree(EXAMPLE, workdir / "input_fas")
    write_overlaps(str(workdir / "original_overlaps.txt"), overlaps)
    subprocess.check_call([
        sys.executable, os.path.join(REFBUILD, "run_reference_stage.py"),
        "--workdir", str(workdir / "stage_a"), "--stage", "a",
        "--fastq", "../input_fas", "--overlaps", "../original_overlaps.txt",
        "--min_overlap_len", "200", "--remove_branches", "true",
        "--max_tip_len", "415", "--edge_threshold", "0.97",
        "--clique_size_EC", "4"])
    ref_lens = fastq_lengths(workdir / "stage_a" / "singles.fastq")

    # --- our run
    params = StageParams(stage="a", min_overlap_len=200, edge_threshold=0.97,
                         remove_branches=True, max_tip_len=415,
                         original_readcount=len(store), backend="numpy")
    res = run_stage(params, store, overlaps)
    our_lens = sorted((res.store.read_len(i) for i in range(len(res.store))),
                      reverse=True)

    # contig count within 5%, top-5 contig lengths identical
    assert abs(len(our_lens) - len(ref_lens)) <= max(3, 0.05 * len(ref_lens))
    assert our_lens[:5] == ref_lens[:5]
    # total assembled length within 3%
    assert abs(sum(our_lens) - sum(ref_lens)) <= 0.03 * sum(ref_lens)
