"""Golden regression: full de novo stage a on savage/example must keep
producing the EXACT contig set that was proven bit-identical to the
reference binary (docs/PARITY.md; the slow proof itself lives in
test_reference_parity.py behind RUN_SLOW). This is the fast default-suite
guard: candidate count, iteration count, per-contig lengths, and a SHA256
over the sorted (seq, qual) records.

Parametrized over the two host backends — "numpy" (the f64 oracle) and
"native" (the C++ OpenMP engine whose decisions are made exact by the
RECHECK_MARGIN machinery) — so both production host paths are pinned to
the same bit-identical output.

Runtime ~1 min on 2 vCPUs — by far the slowest default test, kept because
it end-to-end covers candidates -> verification -> graph -> cliques ->
consensus -> FNO across all 8 iterations (candidates and the golden
fixture are computed once per session).
"""

import hashlib
import json
import os

import pytest

EXAMPLE = "/root/reference/savage/example/input_fas"
FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "stage_a_denovo_golden.json")


@pytest.fixture(scope="module")
def example_inputs():
    from haploconduct_tpu.core.reads import ReadStore
    from haploconduct_tpu.workflows.savage import denovo_candidates

    with open(FIXTURE) as f:
        golden = json.load(f)
    store = ReadStore.from_files(
        singles=f"{EXAMPLE}/singles.fastq",
        paired1=f"{EXAMPLE}/paired1.fastq", paired2=f"{EXAMPLE}/paired2.fastq")
    overlaps = denovo_candidates(store, 200, 50)
    assert len(overlaps) == golden["n_candidates"]
    return store, overlaps, golden


@pytest.mark.parametrize("backend", ["numpy", "native"])
def test_stage_a_denovo_golden(example_inputs, backend):
    from haploconduct_tpu.assemble.stages import StageParams, run_stage

    store, overlaps, golden = example_inputs
    params = StageParams(stage="a", min_overlap_len=200, edge_threshold=0.97,
                         remove_branches=True, max_tip_len=415,
                         original_readcount=len(store), backend=backend)
    res = run_stage(params, store, overlaps)
    assert res.iterations == golden["iterations"]

    st = res.store
    lens = sorted((st.read_len(i) for i in range(len(st))), reverse=True)
    assert lens == golden["lengths"]
    assert sum(lens) == golden["total_bp"]

    recs = []
    for i in range(len(st)):
        if st.is_paired[i]:
            recs.append(st.seq_str(i, 1) + "|" + st.phred_str(i, 1) + "|"
                        + st.seq_str(i, 2) + "|" + st.phred_str(i, 2))
        else:
            recs.append(st.seq_str(i, 0) + "|" + st.phred_str(i, 0))
    recs.sort()
    digest = hashlib.sha256("\n".join(recs).encode()).hexdigest()
    assert digest == golden["records_sha256"]
