"""Native C++ builders vs numpy reference implementations."""

import numpy as np
import pytest

from lupinpathtracer_tpu.accel import native
from lupinpathtracer_tpu.accel.alias_table import build_alias_table
from lupinpathtracer_tpu.io import hdr


needs_native = pytest.mark.skipif(
    not native.available(), reason="g++ unavailable"
)


@needs_native
def test_native_bvh_valid(rng):
    T = 5000
    c = rng.random((T, 3)).astype(np.float32) * 10
    e = rng.random((T, 3)).astype(np.float32) * 0.2
    lo, hi = c - e, c + e
    nmin, nmax, nfirst, ncount, order, depth = native.build_bvh_native(lo, hi)
    assert sorted(order.tolist()) == list(range(T))
    leaf = ncount > 0
    assert ncount[leaf].sum() == T
    assert ncount[leaf].max() <= 4
    assert depth <= 25
    # Every leaf's bbox contains its triangles; children inside parents.
    for n in np.nonzero(leaf)[0][:300]:
        idx = order[nfirst[n] : nfirst[n] + ncount[n]]
        assert np.all(lo[idx] >= nmin[n] - 1e-4)
        assert np.all(hi[idx] <= nmax[n] + 1e-4)
    internal = np.nonzero(~leaf)[0]
    for n in internal[:300]:
        for ch in (nfirst[n], nfirst[n] + 1):
            assert np.all(nmin[ch] >= nmin[n] - 1e-4)
            assert np.all(nmax[ch] <= nmax[n] + 1e-4)


@needs_native
def test_native_alias_matches_numpy(rng):
    w = rng.random(10000).astype(np.float32)
    p_n, t_n, a_n = native.build_alias_table_native(w)
    # numpy reference (force by small-table path semantics)
    p_r, t_r, a_r = build_alias_table(w[:1000])
    p_n2, t_n2, a_n2 = native.build_alias_table_native(w[:1000])
    np.testing.assert_allclose(p_n2, p_r, atol=1e-7)
    np.testing.assert_allclose(t_n2, t_r, atol=1e-6)
    np.testing.assert_array_equal(a_n2, a_r)
    # validity of the big table
    eff = t_n.astype(np.float64) / len(w)
    for i in range(len(w)):
        if t_n[i] < 1.0:
            eff[a_n[i]] += (1.0 - t_n[i]) / len(w)
    np.testing.assert_allclose(eff, w / w.sum(), atol=1e-5)


@needs_native
def test_native_rgbe_matches_python(tmp_path, rng):
    img = (rng.random((33, 65, 3)) * 8.0).astype(np.float32)
    path = tmp_path / "x.hdr"
    hdr.write_hdr(path, img)
    a = hdr.read_hdr(path)  # native path
    # force python fallback
    import lupinpathtracer_tpu.accel.native as nat

    orig = nat.decode_rgbe_native
    nat.decode_rgbe_native = lambda *a_, **k_: None
    try:
        b = hdr.read_hdr(path)
    finally:
        nat.decode_rgbe_native = orig
    np.testing.assert_array_equal(a, b)


@needs_native
def test_native_rgbe_reference_golden():
    golden = "/root/reference/test_scenes/environments1/render_cam1.hdr"
    a = hdr.read_hdr(golden)
    import lupinpathtracer_tpu.accel.native as nat

    orig = nat.decode_rgbe_native
    nat.decode_rgbe_native = lambda *a_, **k_: None
    try:
        b = hdr.read_hdr(golden)
    finally:
        nat.decode_rgbe_native = orig
    np.testing.assert_array_equal(a, b)
