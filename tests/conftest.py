"""Test config: CPU backend with an 8-device virtual mesh, fp32 matmuls.

Multi-chip sharding tests run on the virtual device mesh
(`xla_force_host_platform_device_count`, SURVEY.md §4 implication); parity
tests need full fp32 matmul precision (TPU bf16 default would break the
atol 1e-4 contract, SURVEY.md §7.3).
"""

import os

# Force the CPU backend with 8 virtual devices.  NOTE: the environment may
# pin JAX_PLATFORMS=axon (TPU tunnel) and auto-register it via
# sitecustomize keyed on PALLAS_AXON_POOL_IPS — override both BEFORE jax
# is imported.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize may have imported jax (registering the axon TPU plugin)
# BEFORE this conftest ran, baking JAX_PLATFORMS=axon into the config —
# override through the config API, which works until a backend is used.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", (
    "tests must run on the CPU backend; got " + jax.default_backend())
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

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
