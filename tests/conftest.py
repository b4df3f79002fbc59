"""Test configuration: force JAX onto CPU with 8 virtual devices.

This gives every test a deterministic fake multi-chip backend (the reference
has no equivalent — see SURVEY.md §4): sharding/collective tests run on an
8-device host mesh without TPUs, and parity tests against the torch reference
run on identical (CPU) arithmetic.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize pins jax_platforms="axon,cpu" regardless of the env
# var; force the CPU backend explicitly so tests run on the virtual 8-device
# mesh (and not through the single-chip TPU tunnel).
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

REFERENCE_DIR = "/root/reference"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running scale test (minutes on the CPU mesh)")


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
