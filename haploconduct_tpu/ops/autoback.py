"""Automatic verification-backend selection (backend="auto").

The production question is host-OpenMP vs device for the verification
stream. On a tunneled deployment (~22ms/transfer, single-digit MB/s) the
host engine wins by orders of magnitude; on a production PCIe v5e host
the same arithmetic favors the chip by >100x (BASELINE.md "dispatch-path
accounting": 16B/subtask over ~12GB/s = 750M verifs/s of link against a
~200k/s/2-core host engine). backend="auto" measures the LINK once per
process — no kernel compile, just h2d/d2h round trips with
dedup-resistant random payloads — projects the dispatch-path rate from
the measured bandwidth and latency, micro-benchmarks the native engine,
and picks the winner. The crossover rule: take the chip when the
projected dispatch rate for a representative 1M-task batch exceeds 2x
the measured native rate (the 2x guard absorbs probe noise; beyond it
the chip path only pulls further ahead since per-chip throughput is
~27M/s). Reference analog: the engine-selection flag plumbing of
savage.py:643-677 (rust-overlaps vs blast fallback selection).

HC_BACKEND=native|jax|numpy overrides the probe entirely.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

import numpy as np

# Effective round-trip bytes per verification task at STAGE level. The
# packed dispatch stream alone is 16B/subtask (BASELINE.md), but a real
# stage also re-uploads packed read matrices each iteration and pays
# per-chunk dispatch overhead; 48B/task makes the projection reproduce
# the measured stage-level outcome on this tunneled deployment (native
# engine ~200k/s vs chip-path stage verify far below its dispatch-path
# best window) while leaving a PCIe host >100x above any host engine.
BYTES_PER_TASK = 48.0
ONCHIP_RATE = 20e6  # measured on-device loop rate; caps the projection
PROBE_TASKS = 1e6  # representative dispatch batch
# The chip must project >5x the native engine to switch: links sit orders
# of magnitude apart (tunnel ~MB/s vs PCIe ~GB/s), so only near-boundary
# deployments are affected, and for those the stage-level measurement
# (BASELINE.md 10x rows: 661.9s chip vs 20-23s host) says stay native.
CROSSOVER = 5.0

_cache: dict = {}


def probe_link(size: int = 1 << 20) -> dict:
    """Measured link characteristics to device 0: h2d/d2h bytes/s and a
    fixed per-transfer latency (seconds), from one small + one `size`-byte
    transfer each way. Payloads are random: the tunnel content-dedups
    repeated buffers, which would flatter a zeros probe."""
    import jax

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    tiny = rng.integers(0, 256, 64, dtype=np.uint8)
    big = rng.integers(0, 256, size, dtype=np.uint8)

    t0 = time.perf_counter()
    d_tiny = jax.device_put(tiny, dev)
    d_tiny.block_until_ready()
    lat_h2d = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(d_tiny)
    lat_d2h = time.perf_counter() - t0

    t0 = time.perf_counter()
    d_big = jax.device_put(big, dev)
    d_big.block_until_ready()
    t_h2d = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(d_big)
    t_d2h = time.perf_counter() - t0

    lat = max(min(lat_h2d, lat_d2h), 1e-6)
    return {
        "h2d_Bps": size / max(t_h2d - lat_h2d, 1e-9),
        "d2h_Bps": size / max(t_d2h - lat_d2h, 1e-9),
        "lat_s": lat,
    }


def probe_native_rate(n_tasks: int = 65536) -> float:
    """Quick micro-bench of the native OpenMP scorer (verifs/s) on
    synthetic 150bp tasks; ~0.2s on 2 cores."""
    from ..native import load_baseline_ext

    ext = load_baseline_ext()
    if ext is None:
        return 0.0
    rng = np.random.default_rng(1)
    n_reads, L = 256, 150
    codes = rng.integers(0, 4, (2 * n_reads, L), dtype=np.int8)
    quals = np.full((2 * n_reads, L), 30, dtype=np.uint8)
    lens = np.full(2 * n_reads, L, dtype=np.int32)
    row_a = rng.integers(0, n_reads, n_tasks, dtype=np.int32)
    row_b = rng.integers(0, n_reads, n_tasks, dtype=np.int32)
    pos = rng.integers(0, L // 2, n_tasks, dtype=np.int32)
    ext.score_tasks(codes, quals, lens, row_a, row_b, pos)  # warm
    t0 = time.perf_counter()
    ext.score_tasks(codes, quals, lens, row_a, row_b, pos)
    dt = time.perf_counter() - t0
    return n_tasks / max(dt, 1e-9)


def decide(platform: str, probe: Optional[dict],
           native_rate: float) -> tuple:
    """Pure decision rule (unit-testable with faked probes). Returns
    (backend, info)."""
    if platform == "cpu":
        # the "device" IS the host — the native OpenMP engine is the
        # measured winner on-host (BASELINE.md 10x-scale rows)
        return "native", {"reason": "cpu-only platform"}
    if probe is None or native_rate <= 0.0:
        return "jax", {"reason": "no native engine — chip is the only path"}
    link_Bps = min(probe["h2d_Bps"], probe["d2h_Bps"])
    dispatch_s = (PROBE_TASKS * BYTES_PER_TASK / max(link_Bps, 1.0)
                  + 3 * probe["lat_s"]  # upload, dispatch, fetch
                  + PROBE_TASKS / ONCHIP_RATE)
    device_rate = PROBE_TASKS / dispatch_s
    info = {
        "link_Bps": link_Bps,
        "lat_s": probe["lat_s"],
        "projected_device_rate": device_rate,
        "native_rate": native_rate,
    }
    if device_rate > CROSSOVER * native_rate:
        return "jax", info
    return "native", info


def resolve_backend() -> str:
    """Resolve backend="auto" once per process; logs the measured probe."""
    if "backend" in _cache:
        return _cache["backend"]
    env = os.environ.get("HC_BACKEND")
    if env in ("native", "jax", "numpy"):
        _cache["backend"] = env
        return env
    try:
        import jax

        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    probe = None
    native_rate = probe_native_rate()
    if platform != "cpu" and native_rate > 0.0:
        try:
            probe = probe_link()
        except Exception:
            probe = None
            platform = "cpu"
    choice, info = decide(platform, probe, native_rate)
    desc = ", ".join(f"{k}={v:.3g}" if isinstance(v, float) else f"{k}={v}"
                     for k, v in info.items())
    print(f"[auto-backend] platform={platform} -> {choice} ({desc})",
          file=sys.stderr, flush=True)
    _cache["backend"] = choice
    return choice
