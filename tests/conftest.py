"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the driver's multi-chip dry-run environment: sharding/collective
code is validated without TPU hardware. Benchmarks (bench.py) run on the
real chip outside pytest.

IMPORTANT (round-1 lesson): in this sandbox the JAX_PLATFORMS env var is
silently re-forced to the axon TPU backend by a site hook, so the env-var
route does NOT work — `jax.config.update("jax_platforms", "cpu")` does.
We assert the backend so a regression can never be silent again.

Set LUPIN_TEST_TPU=1 to opt in to running the suite on the real TPU
backend instead (single device; sharding tests self-skip).
"""

import os

_WANT_TPU = os.environ.get("LUPIN_TEST_TPU") == "1"

if not _WANT_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _WANT_TPU:
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", (
        f"expected cpu backend, got {jax.default_backend()} — the "
        "jax.config platform forcing regressed (see conftest docstring)"
    )
    assert len(jax.devices()) == 8, (
        f"expected 8 virtual CPU devices, got {len(jax.devices())}"
    )

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_SCENES = "/root/reference/test_scenes"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full interpret-mode sweeps (minutes each on a 1-core host); "
        "excluded from the <3-min core set",
    )
    config.addinivalue_line(
        "markers", "fast: core regression set — auto-applied to every test "
        "not marked slow, so `pytest -m fast` is the quick gate",
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def reference_scene_path(name: str) -> str:
    return os.path.join(REFERENCE_SCENES, name, f"{name}.json")
