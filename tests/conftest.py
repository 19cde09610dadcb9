"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the driver's multi-chip dry-run environment: sharding/collective
code is validated without TPU hardware. Benchmarks (bench.py) run on the
real chip outside pytest.
"""

import os

# Force-set: the sandbox exports JAX_PLATFORMS=axon (TPU tunnel); tests
# must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_SCENES = "/root/reference/test_scenes"


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def reference_scene_path(name: str) -> str:
    return os.path.join(REFERENCE_SCENES, name, f"{name}.json")
