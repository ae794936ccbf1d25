"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` (SURVEY.md section 2.10). Parity
tests against the torch reference also want CPU for determinism.
"""

import os
import sys

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the real TPU
# tunnel), but tests run on a virtual 8-device CPU mesh for determinism and
# sharding coverage. Real-hardware validation happens via bench.py / the
# verify drives. NOTE: `import pytest` already imports jax (plugin), so env
# vars are too late here — use jax.config, which applies pre-backend-init.
os.environ["JAX_PLATFORMS"] = "cpu"          # for any subprocesses
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def reference_available():
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_raft_path():
    """Make the torch reference RAFT importable as an oracle (not copied)."""
    raft_path = os.path.join(REFERENCE_ROOT, "pytracking", "external", "RAFT")
    if raft_path not in sys.path:
        sys.path.insert(0, raft_path)
    return raft_path
