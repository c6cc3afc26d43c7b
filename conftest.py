"""Root conftest: tests run on a virtual 8-device CPU mesh, never on TPU.

Note: this host's sitecustomize force-registers the 'axon' TPU backend and
overrides jax_platforms programmatically, so the JAX_PLATFORMS env var is
not enough — the config must be updated after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Under RUN_TPU=1 only the per-test isolated subprocesses (tpu_isolated in
# tests/test_score.py, marked HC_TPU_SUBPROC=1) talk to the chip; the
# parent pytest process stays on CPU so exactly ONE tunnel client exists
# at any time — running every on-chip test in one shared process
# accumulated device/tunnel state that failed the whole batch (r4 weak #4).
if os.environ.get("RUN_TPU") != "1" or os.environ.get("HC_TPU_SUBPROC") != "1":
    jax.config.update("jax_platforms", "cpu")
