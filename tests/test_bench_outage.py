"""bench.py outage-proofing (VERDICT r3 #2): a simulated backend-init
failure must produce a parseable structured JSON record, and a flap that
heals must succeed on retry — never a bare rc=1 traceback."""

import pytest
import json

import bench


def test_backend_retry_then_success(monkeypatch):
    import jax

    calls = {"n": 0}

    def flaky_devices():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError(
                "Unable to initialize backend 'axon': UNAVAILABLE"
            )
        return ["cpu0"]

    monkeypatch.setattr(jax, "devices", flaky_devices)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    ok, backend, detail = bench._wait_for_backend(attempts=4)
    assert ok and detail is None
    assert calls["n"] == 3


def test_backend_final_failure_is_structured(monkeypatch, capsys):
    import jax

    def dead_devices():
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")

    monkeypatch.setattr(jax, "devices", dead_devices)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    ok, backend, detail = bench._wait_for_backend(attempts=2)
    assert not ok and "UNAVAILABLE" in detail

    bench._emit_backend_unavailable(detail)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)  # the driver must be able to parse it
    assert rec["error"] == "backend_unavailable"
    assert rec["value"] == 0 and rec["vs_baseline"] == 0.0
    assert "UNAVAILABLE" in rec["detail"]


def test_traversal_backend_labels():
    """The bench must report which traversal each config actually used."""

    from lupinpathtracer_tpu.io import builtin
    from lupinpathtracer_tpu.scene.flatten import build_scene_tpu

    scene, _ = builtin.build_scene_cornell_box()
    tpu = build_scene_tpu(scene)
    assert bench._traversal_backend(tpu) in (
        "dense-mxu", "packet", "sort-wavefront"
    )


@pytest.mark.slow
def test_bench_bvh_scene_end_to_end_tiny():
    """The shared config path of bench configs 2-5 (probe -> timed render ->
    metric dict with a backend label) must run end-to-end. Configs 4/5 were
    added this round and would otherwise first execute on the driver's
    hardware run."""

    from lupinpathtracer_tpu.io.synthetic import build_scene_terrain

    rec = bench.bench_bvh_scene(
        name="tiny-terrain",
        metric="smoke_tiny_terrain",
        cam_idx=0,
        builder=lambda: build_scene_terrain(n_tris=2048, seed=0),
        W=64,
        H=32,
        SPP=1,
    )
    assert rec["metric"] == "smoke_tiny_terrain"
    assert rec["unit"] == "Mrays/s/chip"
    assert rec["value"] > 0
    assert rec["backend"] in (
        "dense-mxu", "packet", "packet-stream", "sort-wavefront",
            "hybrid-packet/sort"
    )


@pytest.mark.slow
def test_bench_ab_backends_reports_both():
    """ab_backends must time BOTH traversal backends, report both numbers,
    and pick the winner (the measurement-driven safety valve for the
    unproven-on-hardware packet default)."""

    from lupinpathtracer_tpu.io.synthetic import build_scene_terrain

    rec = bench.bench_bvh_scene(
        name="tiny-terrain-ab",
        metric="smoke_ab",
        cam_idx=0,
        builder=lambda: build_scene_terrain(n_tris=2048, seed=0),
        W=64,
        H=32,
        SPP=1,
        ab_backends=True,
    )
    assert "ab_packet" in rec and "ab_sort" in rec
    legs = {
        "packet": rec["ab_packet"],
        "sort": rec["ab_sort"],
    }
    if "ab_packet_raysort" in rec:
        legs["packet+raysort"] = rec["ab_packet_raysort"]
    assert rec["ab_winner"] in legs
    assert rec["value"] == max(legs.values())
    assert rec["value"] == legs[rec["ab_winner"]]
