"""Checkpoint provenance guard (apps/golden_test.py).

A resume checkpoint rendered by a DIFFERENT version of the compute path
must not be blended into a gate image: 40 accums of old code + 60 of new
code produced the arealights1 cam2 full-workload FAIL (soft highlight
edges = two sharp renders blended; out_hw/full_arealights1.log). The
runner stamps a content hash of the package source into every ckpt and
discards mismatches unless LUPIN_CKPT_ALLOW_STALE=1.
"""

import numpy as np
import pytest

from lupinpathtracer_tpu.apps import golden_test as gt

pytestmark = pytest.mark.fast


def test_code_sha_stable_and_source_sensitive():
    s = gt._code_sha()
    assert len(s) == 12
    assert gt._code_sha() == s  # cached, deterministic


def test_ckpt_roundtrip_stamps_sha(tmp_path):
    p = tmp_path / "ckpt.npz"
    np.savez(p, image=np.zeros((4, 4, 4)), counter=3, spp_per_pass=10,
             code_sha=gt._code_sha())
    ck = np.load(p, allow_pickle=False)
    assert str(ck["code_sha"]) == gt._code_sha()
    assert int(ck["counter"]) == 3


def test_stale_sha_detected(tmp_path):
    p = tmp_path / "ckpt.npz"
    np.savez(p, image=np.zeros((4, 4, 4)), counter=3, spp_per_pass=10,
             code_sha="deadbeef0000")
    ck = np.load(p, allow_pickle=False)
    assert str(ck["code_sha"]) != gt._code_sha()


def test_legacy_ckpt_without_sha(tmp_path):
    # Pre-guard checkpoints have no code_sha key: treated as stale.
    p = tmp_path / "ckpt.npz"
    np.savez(p, image=np.zeros((4, 4, 4)), counter=3, spp_per_pass=10)
    ck = np.load(p, allow_pickle=False)
    assert "code_sha" not in ck
