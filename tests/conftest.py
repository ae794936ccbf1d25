"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` (SURVEY.md section 2.10). Parity
tests against the torch reference also want CPU for determinism.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

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
