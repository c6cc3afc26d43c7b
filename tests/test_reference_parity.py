"""Bit-identical parity of the full stage-a pipeline against the actual
reference binary.

Builds the read-only reference sources (/root/reference) with the boost
shims in tools/refbuild, feeds BOTH pipelines identical candidate overlaps,
and asserts EXACT equality of every per-iteration artifact the reference
writes: the converged contig set (sequence + quality records), the
subreads.txt provenance, and the final overlap set. Requires the
reference-order mode (quick-cliques emission order + libstdc++
unordered_map iteration order, haploconduct_tpu/native/refsem.cpp).
Marked slow: ~3-4 min. RUN_SLOW=1 to run.
"""

import os
import shutil
import subprocess
import sys

import pytest

REFBUILD = "/root/repo/tools/refbuild"
EXAMPLE = "/root/reference/savage/example/input_fas"
HIV_REF = "/root/reference/savage/example/hiv-ref.fasta"

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


def fastq_records(path):
    """id -> (seq, qual); empty when the file does not exist."""
    recs = {}
    if not os.path.isfile(path):
        return recs
    with open(path) as f:
        lines = f.read().splitlines()
    for i in range(0, len(lines) - 3, 4):
        recs[lines[i][1:]] = (lines[i + 1], lines[i + 3])
    return recs


def run_reference_stage_a(tmp_path, overlaps):
    from haploconduct_tpu.io.overlaps import write_overlaps

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
    return workdir / "stage_a"


def run_our_stage_a(store, overlaps):
    from haploconduct_tpu.assemble.stages import StageParams, run_stage

    params = StageParams(stage="a", min_overlap_len=200, edge_threshold=0.97,
                         remove_branches=True, max_tip_len=415,
                         original_readcount=len(store), backend="numpy")
    return run_stage(params, store, overlaps)


def assert_exact_parity(stage_dir, res):
    from haploconduct_tpu.io.subreads import subreads_to_text

    ref = fastq_records(stage_dir / "singles.fastq")
    for end in (1, 2):
        for rid, rec in fastq_records(stage_dir / f"paired{end}.fastq").items():
            ref[f"{rid}/{end}"] = rec

    ours = {}
    st = res.store
    for i in range(len(st)):
        rid = int(st.ids[i])
        if st.is_paired[i]:
            ours[f"{rid}/1"] = (st.seq_str(i, 1), st.phred_str(i, 1))
            ours[f"{rid}/2"] = (st.seq_str(i, 2), st.phred_str(i, 2))
        else:
            ours[str(rid)] = (st.seq_str(i, 0), st.phred_str(i, 0))

    assert set(ours) == set(ref), (
        f"contig id sets differ: {len(ours)} vs {len(ref)}; "
        f"only_ours={sorted(set(ours) - set(ref))[:5]} "
        f"only_ref={sorted(set(ref) - set(ours))[:5]}")
    bad = [k for k in ref if ref[k] != ours[k]]
    assert not bad, f"{len(bad)} contig records differ, first: {bad[0]}"

    with open(stage_dir / "subreads.txt") as f:
        ref_sub = f.read()
    assert subreads_to_text(res.subreads) == ref_sub, "subreads.txt differs"


def load_example_store():
    from haploconduct_tpu.core.reads import ReadStore

    return ReadStore.from_files(
        singles=f"{EXAMPLE}/singles.fastq",
        paired1=f"{EXAMPLE}/paired1.fastq", paired2=f"{EXAMPLE}/paired2.fastq")


def test_stage_a_parity_denovo(tmp_path):
    build_reference_binary()
    from haploconduct_tpu.workflows.savage import denovo_candidates

    store = load_example_store()
    overlaps = denovo_candidates(store, 200, 50)
    stage_dir = run_reference_stage_a(tmp_path, overlaps)
    res = run_our_stage_a(store, overlaps)
    assert_exact_parity(stage_dir, res)


def test_stage_a_parity_ref_guided(tmp_path):
    build_reference_binary()
    from haploconduct_tpu.ops.align import ReferenceIndex
    from haploconduct_tpu.workflows.savage import ref_guided_candidates

    store = load_example_store()
    ref_index = ReferenceIndex.from_fasta(HIV_REF)
    overlaps = ref_guided_candidates(store, ref_index, 200)
    stage_dir = run_reference_stage_a(tmp_path, overlaps)
    res = run_our_stage_a(store, overlaps)
    assert_exact_parity(stage_dir, res)


def test_polyte_parity(tmp_path):
    """Bit-identical POLYTE parity on polyte/example: the reference binary
    driven through the full polyte iteration scheme (tools/refbuild/
    run_reference_polyte.py) vs our in-memory workflow, identical per-
    iteration candidates from the shared k-mer engine; every iteration's
    contig fastq and subreads.txt must match byte-for-byte, through the
    main assembly round AND the diploid merge round (~15 min)."""
    build_reference_binary()
    sys.path.insert(0, "/root/repo/tools")
    sys.argv = ["polyte_parity_debug.py", str(tmp_path / "polyte"), "--diploid"]
    import polyte_parity_debug

    first_diff = polyte_parity_debug.main()
    assert first_diff is None, f"POLYTE diverges at iteration {first_diff}"


def test_envelope_patch_parity(tmp_path):
    """Bit-identical stage a vs the reference binary on ONE 44k-read patch
    of the SAVAGE 10,000x envelope workload (11.8M shared candidates, 18x
    the example parity scale), plus the measured side-by-side wall-clock
    (~7 min total; BASELINE.md 'Envelope-patch parity')."""
    build_reference_binary()
    import json
    import subprocess as sp

    r = sp.run([sys.executable, "/root/repo/tools/envelope_patch_parity.py",
                "--workdir", str(tmp_path / "epp")],
               capture_output=True, timeout=3600, text=True)
    assert r.returncode == 0, r.stderr[-3000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["bit_identical"], out
    assert out["ours_contigs"] == out["reference_contigs"], out
