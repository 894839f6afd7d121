"""Test configuration: force the CPU backend with a virtual 8-device mesh.

Multi-chip sharding paths (thor_tpu.parallel) are validated on a faked
8-device CPU mesh, mirroring how the driver dry-runs `dryrun_multichip`.
Must run before the first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: golden-stream decodes re-jit per shape
# class; caching across runs keeps the default suite fast.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault(
    "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import sys
from pathlib import Path

import jax

# The axon TPU plugin overrides the JAX_PLATFORMS env var and probes
# the (possibly unreachable) tunnel; the config flag wins and keeps the
# suite on the virtual CPU mesh unconditionally.
jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

TESTDATA = REPO / "testdata"
ORACLE_ENC = REPO / ".oracle" / "Thorenc"
ORACLE_DEC = REPO / ".oracle" / "Thordec"
