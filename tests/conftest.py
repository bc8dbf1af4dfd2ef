"""Test config: CPU backend with an 8-device virtual mesh, fp32 matmuls.

Multi-chip sharding tests run on the virtual device mesh
(`xla_force_host_platform_device_count`, SURVEY.md §4 implication); parity
tests need full fp32 matmul precision (TPU bf16 default would break the
atol 1e-4 contract, SURVEY.md §7.3).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="session")
def golden_unit():
    path = os.path.join(GOLDEN_DIR, "unit.npz")
    if not os.path.exists(path):
        pytest.skip("golden files not generated (tools/generate_golden.py)")
    return np.load(path)


def load_golden_stream(name):
    path = os.path.join(GOLDEN_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"golden file {name} missing")
    return np.load(path)
