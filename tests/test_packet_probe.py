"""Packet-backend probe + dispatch fallback (ADVICE r3 #2).

The packet kernel is default-on; these tests pin the safety story around
that: the probe is keyed on the scene's actual static specialization, a
disabled signature flips every consumer to the sort backend, and a
dispatch-time failure retries on the sort backend instead of crashing."""

import numpy as np
import jax.numpy as jnp
import pytest

from lupinpathtracer_tpu.core import vec3 as v3
from lupinpathtracer_tpu.core.types import (
    BakedPathtraceParams,
    PathtraceDesc,
)
from lupinpathtracer_tpu.io import builtin
from lupinpathtracer_tpu.kernels import intersect, pallas_packet
from lupinpathtracer_tpu.render import renderer
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu


@pytest.fixture
def bvh_scene():
    scene, _ = builtin.build_scene_cornell_box()
    tpu = build_scene_tpu(scene, dense_max_tris=8)
    assert tpu.use_bvh
    return tpu


def _multi_sl_scene(rng):
    # A scene guaranteed to have a real top tree (packet-eligible).
    from tests.test_wavefront import _tri_sphere_scene

    tpu = build_scene_tpu(_tri_sphere_scene(), dense_max_tris=64)
    assert intersect.packet_eligible(tpu)
    return tpu


def test_probe_key_is_static_and_cached(rng):
    tpu = _multi_sl_scene(rng)
    key = pallas_packet.scene_probe_key(tpu)
    assert all(isinstance(x, (bool, int)) for x in key)
    # CPU backend: probe marks the signature good without compiling.
    assert pallas_packet.probe_scene(tpu)
    assert pallas_packet._PROBE_OK[key] is True


def test_disable_flips_use_packet(rng):
    tpu = _multi_sl_scene(rng)
    key = pallas_packet.scene_probe_key(tpu)
    prev = pallas_packet._PROBE_OK.get(key)
    try:
        assert intersect._use_packet(tpu)
        pallas_packet.disable(tpu, "test")
        assert not intersect._use_packet(tpu)
    finally:
        if prev is None:
            pallas_packet._PROBE_OK.pop(key, None)
        else:
            pallas_packet._PROBE_OK[key] = prev


def test_probe_rays_span_scene(rng):
    tpu = _multi_sl_scene(rng)
    ro, rd = pallas_packet._probe_rays(tpu)
    for c in (ro.x, ro.y, ro.z, rd.x, rd.y, rd.z):
        assert bool(jnp.isfinite(c).all())
    # The bundle must produce BOTH hits and misses through the real tree.
    hit = intersect.closest_hit_bvh(tpu, ro, rd, 1e-4).hit
    n_hit = int(jnp.sum(hit))
    assert 0 < n_hit < ro.x.shape[0]


def test_dispatch_failure_falls_back_to_sort(rng, monkeypatch):
    """A packet dispatch failure must disable the signature and retry on
    the sort backend — the render completes instead of raising. On this
    CPU host the re-probe trusts interpret mode (returns True), so the
    wrapper first retries the packet path once (transient-blame) before
    disabling: 3 calls total."""

    tpu = _multi_sl_scene(rng)
    key = pallas_packet.scene_probe_key(tpu)
    monkeypatch.setitem(pallas_packet._PROBE_OK, key, True)
    renderer._DISPATCH_PROVEN.discard(key)

    calls = {"n": 0}

    def fake_jitfn(scene, image):
        calls["n"] += 1
        # Mimic the real failure mode: the packet kernel inside the traced
        # step fails iff the backend decision still selects it.
        if intersect._use_packet(scene):
            raise RuntimeError("Mosaic lowering failed (simulated)")
        return "rendered-on-sort"

    out = renderer._dispatch_packet_safe(tpu, fake_jitfn, jnp.zeros(4))
    assert out == "rendered-on-sort"
    assert calls["n"] == 3
    assert pallas_packet._PROBE_OK[key] is False
    # Cleanup so later tests see a clean probe table.
    pallas_packet._PROBE_OK.pop(key, None)


def test_dispatch_runtime_failure_clears_jit_cache(rng, monkeypatch):
    """Regression: disable() flips a global the jit cache doesn't key on,
    so without clear_cache() a retry re-runs the SAME compiled packet
    executable and re-faults. The wrapper must clear the cache before
    every re-trace attempt."""

    tpu = _multi_sl_scene(rng)
    key = pallas_packet.scene_probe_key(tpu)
    monkeypatch.setitem(pallas_packet._PROBE_OK, key, True)
    renderer._DISPATCH_PROVEN.discard(key)
    # Force the disable path (a real TPU re-probe failing).
    monkeypatch.setattr(pallas_packet, "probe_scene", lambda s: False)

    class FakeJit:
        cleared = 0
        calls = 0

        def __call__(self, scene, image):
            self.calls += 1
            if self.cleared == 0:  # stale cached executable still faults
                raise RuntimeError("hardware fault (simulated)")
            return "rendered-after-clear"

        def clear_cache(self):
            self.cleared += 1

    fn = FakeJit()
    out = renderer._dispatch_packet_safe(tpu, fn, jnp.zeros(4))
    assert out == "rendered-after-clear"
    assert fn.cleared >= 1 and fn.calls == 2
    assert pallas_packet._PROBE_OK[key] is False
    pallas_packet._PROBE_OK.pop(key, None)


def test_dispatch_transient_failure_keeps_packet(rng, monkeypatch):
    """A failure whose re-probe PASSES is blamed on a transient: the
    packet path is retried and, when it succeeds, stays enabled."""

    tpu = _multi_sl_scene(rng)
    key = pallas_packet.scene_probe_key(tpu)
    monkeypatch.setitem(pallas_packet._PROBE_OK, key, True)
    renderer._DISPATCH_PROVEN.discard(key)
    monkeypatch.setattr(pallas_packet, "probe_scene", lambda s: True)

    calls = {"n": 0}

    def flaky_jitfn(scene, image):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("tunnel flap (simulated)")
        return "rendered-on-packet"

    out = renderer._dispatch_packet_safe(tpu, flaky_jitfn, jnp.zeros(4))
    assert out == "rendered-on-packet"
    assert calls["n"] == 2
    assert pallas_packet._PROBE_OK.get(key) is not False  # NOT poisoned
    assert key in renderer._DISPATCH_PROVEN
    renderer._DISPATCH_PROVEN.discard(key)
    pallas_packet._PROBE_OK.pop(key, None)


def test_dispatch_failure_on_sort_backend_raises(bvh_scene, monkeypatch):
    """Failures NOT attributable to the packet backend must propagate."""

    monkeypatch.setenv("LUPIN_NO_PACKET", "1")

    def fake_jitfn(scene, image):
        raise RuntimeError("unrelated")

    with pytest.raises(RuntimeError, match="unrelated"):
        renderer._dispatch_packet_safe(bvh_scene, fake_jitfn, jnp.zeros(4))


@pytest.mark.slow
def test_render_still_works_with_probe_disabled(rng):
    """End-to-end: a disabled packet signature renders via the sort
    backend and matches the packet render (CPU interpret parity)."""

    tpu = _multi_sl_scene(rng)
    key = pallas_packet.scene_probe_key(tpu)
    desc = PathtraceDesc(
        camera_transform=np.array(
            [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.5]], np.float32
        ),
    )
    baked = BakedPathtraceParams(samples_per_pixel=1, max_bounces=2)
    img0 = renderer.new_accumulation_buffer(32, 32)
    a = renderer.pathtrace_scene(tpu, img0, desc, baked)
    prev = pallas_packet._PROBE_OK.get(key)
    try:
        pallas_packet.disable(tpu, "test")
        b = renderer.pathtrace_scene(
            tpu, renderer.new_accumulation_buffer(32, 32), desc, baked
        )
    finally:
        if prev is None:
            pallas_packet._PROBE_OK.pop(key, None)
        else:
            pallas_packet._PROBE_OK[key] = prev
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
    )
