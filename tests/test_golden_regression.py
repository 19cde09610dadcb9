"""Pinned self-golden regression (the analog of lupin_tests' golden images).

tests/goldens/*.npy are renders pinned at a known-good state (cross-checked
against the reference's goldens: furnace1 mean within 0.1%, arealights1 mean
within 0.2% at equal workloads on TPU). Any semantic drift in the sampling
chain, BSDFs, lights, or RNG shows up as an exact mismatch here because the
comparison runs on the same platform with the same seeds.
"""

import os

import numpy as np
import pytest

from lupinpathtracer_tpu.core.types import (
    BakedPathtraceParams,
    PathtraceDesc,
    PathtraceType,
)
from lupinpathtracer_tpu.io import builtin
from lupinpathtracer_tpu.render import renderer
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.mark.parametrize("ptype", [PathtraceType.STANDARD, PathtraceType.MIS])
def test_cornell_pinned(ptype):
    path = os.path.join(GOLDEN_DIR, f"cornell_32_{ptype.name.lower()}.npy")
    golden = np.load(path)
    scene, cams = builtin.build_scene_cornell_box()
    tpu = build_scene_tpu(scene)
    desc = PathtraceDesc()
    desc.camera_transform = cams[0].transform
    desc.camera_params = cams[0].params
    desc.pathtrace_type = ptype
    desc.advanced.max_radiance = 10.0
    baked = BakedPathtraceParams(max_bounces=8, samples_per_pixel=8)
    img = renderer.render_progressive(tpu, desc, baked, 32, 32, 8)
    # Same platform + same seeds: only float reassociation may differ.
    np.testing.assert_allclose(img, golden, atol=2e-3)
