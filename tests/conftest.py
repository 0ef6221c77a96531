"""Test env: force CPU JAX with 8 virtual devices so sharding/multichip tests
run without TPU hardware (the standard JAX substitute for a fake cluster).

Some site plugins import jax before this conftest runs, so besides setting the
env vars we also reconfigure jax directly — that works as long as the backend
has not been initialised yet (first device call), which is the case at pytest
collection time.  x64 is enabled so float64 parity tests against scipy/numpy
oracles are meaningful; ops take their dtype from inputs, so float32 behaviour
is still exercised by passing float32 arrays.
"""

import os
import sys

# POLARDEPTH_TEST_TPU=1 opts the run into the real accelerator (for the
# TPU-gated Mosaic/Pallas numerics tests, which skip themselves on CPU);
# everything else keeps the virtual 8-device CPU mesh.
_USE_TPU = os.environ.get("POLARDEPTH_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if not _USE_TPU and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
if not _USE_TPU:
    # x64 parity tests against float64 scipy/numpy oracles; TPU runs keep
    # the native f32 world (f64 is unsupported on the MXU).
    os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402  (import position is the point)

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the train-step graphs take minutes to
# compile on CPU; cached binaries make repeat test runs fast.
_CACHE = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: expensive end-to-end/convergence test, skipped by default; "
        "run with --runslow or POLARDEPTH_SLOW_TESTS=1 (VERDICT r3 #7)")


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or \
            os.environ.get("POLARDEPTH_SLOW_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow tier (use --runslow / POLARDEPTH_SLOW_TESTS=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
