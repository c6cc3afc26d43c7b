"""Multi-host execution test: a REAL 2-process jax.distributed group on
the CPU backend running SAVAGE with --split patches round-robined over
processes (parallel/distributed.py). Every process must converge to the
same contigs as the single-process run — the allgather of per-patch stage
a results makes the joint stages replicated (savage.py:373-396 was
sequential per-patch in the reference; SURVEY §2f multi-host mapping).
"""

import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                               process_id=pid)
    sys.path.insert(0, %(repo)r)
    import numpy as np
    from haploconduct_tpu.core.reads import ReadStore
    from haploconduct_tpu.utils.simulate import random_genome, simulate_reads
    from haploconduct_tpu.workflows.savage import SavageConfig, run_savage

    rng = np.random.default_rng(11)
    genome = random_genome(rng, 2500)
    seqs, quals = simulate_reads([genome], coverage=30, read_len=150,
                                 rng=rng, error_rate=0.002)
    store = ReadStore()
    for i, (sq, q) in enumerate(zip(seqs, quals)):
        store.add_single(i, sq, q)
    store.readcount_single = len(seqs)
    cfg = SavageConfig(min_overlap_len=80, split_num=2, backend="numpy",
                       stage_b=False, stage_c=False, filtering=False)
    res = run_savage(store, cfg)
    st = res.stage_a.store
    recs = sorted(st.seq_str(i) for i in range(len(st)))
    out = sys.argv[3]
    with open(out, "w") as f:
        f.write("\\n".join(recs))
""") % {"repo": REPO}


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_savage_matches_single(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual device split inside workers
    procs = []
    outs = [str(tmp_path / f"out{i}.txt") for i in range(2)]
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid), outs[pid]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        _, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]

    with open(outs[0]) as f:
        recs0 = f.read()
    with open(outs[1]) as f:
        recs1 = f.read()
    assert recs0 == recs1 and recs0  # both processes hold ALL contigs

    # single-process run must match the distributed result
    import numpy as np

    from haploconduct_tpu.core.reads import ReadStore
    from haploconduct_tpu.utils.simulate import random_genome, simulate_reads
    from haploconduct_tpu.workflows.savage import SavageConfig, run_savage

    rng = np.random.default_rng(11)
    genome = random_genome(rng, 2500)
    seqs, quals = simulate_reads([genome], coverage=30, read_len=150,
                                 rng=rng, error_rate=0.002)
    store = ReadStore()
    for i, (sq, q) in enumerate(zip(seqs, quals)):
        store.add_single(i, sq, q)
    store.readcount_single = len(seqs)
    cfg = SavageConfig(min_overlap_len=80, split_num=2, backend="numpy",
                       stage_b=False, stage_c=False, filtering=False)
    res = run_savage(store, cfg)
    st = res.stage_a.store
    single = "\n".join(sorted(st.seq_str(i) for i in range(len(st))))
    assert single == recs0
