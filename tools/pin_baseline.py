"""Pin the OpenMP baseline rate for bench.py (VERDICT r3 task 3).

The headline multiplier historically swung 84x-133x across rounds while the
chip rate barely moved, because bench.py re-measured the 2-vCPU OpenMP
baseline under whatever host load existed at bench time. This tool measures
the baseline as median-of-N in a quiet window and records value + raw
samples + conditions in BASELINE_PINNED.json; bench.py then reports
vs_baseline against the pinned value (stable) and vs_live against an
instantaneous re-measurement (drift diagnostic).

Usage: python tools/pin_baseline.py [N_SAMPLES]
"""
import datetime
import json
import os
import platform
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PINNED_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BASELINE_PINNED.json")


def measure_samples(n_samples=9, n_tasks=200_000):
    os.environ.setdefault("OMP_NUM_THREADS", str(os.cpu_count()))
    from bench import build_workload
    from haploconduct_tpu.native import load_baseline_ext

    ext = load_baseline_ext()
    assert ext is not None, "baseline extension failed to build"
    packed, lens, row_a, row_b, pos = build_workload(n_tasks)
    # warmup (page-in + OpenMP thread spinup)
    ext.score_tasks(packed.codes, packed.quals, lens,
                    row_a[:1000], row_b[:1000], pos[:1000])
    samples = []
    for _ in range(n_samples):
        t0 = time.perf_counter()
        ext.score_tasks(packed.codes, packed.quals, lens, row_a, row_b, pos)
        dt = time.perf_counter() - t0
        samples.append(n_tasks / dt)
        time.sleep(0.2)  # let other host work breathe between samples
    return samples


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    samples = measure_samples(n)
    ordered = sorted(samples)
    median = ordered[len(ordered) // 2]
    try:
        load1, load5, load15 = os.getloadavg()
    except OSError:
        load1 = load5 = load15 = -1.0
    rec = {
        "metric": "OpenMP baseline overlap verifications/s (host)",
        "value": round(median, 1),
        "unit": "verifications/s",
        "samples": [round(s, 1) for s in samples],
        "n_tasks": 200_000,
        "date": datetime.date.today().isoformat(),
        "host_cores": os.cpu_count(),
        "cpu": platform.processor() or platform.machine(),
        "loadavg_at_pin": [load1, load5, load15],
        "note": ("median-of-%d quiet-window runs of native/baseline_score.cpp "
                 "score_tasks on the savage/example workload; re-pin with "
                 "tools/pin_baseline.py when the host changes" % n),
    }
    with open(PINNED_PATH, "w") as f:
        json.dump(rec, f, indent=1)
    spread = (max(samples) - min(samples)) / median
    print(json.dumps({"pinned": rec["value"], "spread_pct": round(100 * spread, 1),
                      "samples": rec["samples"]}))


if __name__ == "__main__":
    main()
