#!/usr/bin/env python
"""Headline benchmark: Cornell box 512x512, 8 bounces, 64 spp, standard
integrator on the software (dense MXU) path — the driver's config #1
(BASELINE.json). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N/100}

"Rays" counts actual traced visibility queries (path segments incl. NEE /
MIS strategy rays), measured by the integrators' per-lane counters — not a
pixels*spp*bounces upper bound.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def _wait_for_backend(attempts=4, backoffs=(20, 60, 120)):
    """Outage-proofing (VERDICT r3 #2): the axon TPU tunnel flaps — a
    transient backend-init failure must produce a structured, parseable
    record (and a retried run must succeed), never a bare rc=1 traceback.

    Returns (ok: bool, backend: str, error_detail: str|None)."""

    import jax

    last = None
    for i in range(attempts):
        try:
            devs = jax.devices()
            return True, jax.default_backend(), None
        except RuntimeError as e:
            last = str(e)
            print(f"# backend init attempt {i + 1}/{attempts} failed: "
                  f"{last.splitlines()[0][:200]}", file=sys.stderr)
            if i + 1 < attempts:
                time.sleep(backoffs[min(i, len(backoffs) - 1)])
    return False, "none", last


def _emit_backend_unavailable(detail):
    out = {
        "metric": "cornellbox_512_8bounce_64spp_ray_throughput",
        "value": 0,
        "unit": "Mrays/s/chip",
        "vs_baseline": 0.0,
        "error": "backend_unavailable",
        "detail": (detail or "")[:400],
    }
    print(json.dumps(out))


def _traversal_backend(scene):
    """Which traversal a scene will actually take (visible in bench output —
    a probe-triggered fallback must never be silent)."""

    if not (scene.use_bvh and scene.sl_count > 0):
        return "dense-mxu"
    from lupinpathtracer_tpu.kernels.intersect import _use_packet
    from lupinpathtracer_tpu.kernels.pallas_packet import smem_tables_fit

    if not _use_packet(scene):
        return "sort-wavefront"
    if scene.two_level and not smem_tables_fit(scene):
        return "packet-stream"
    from lupinpathtracer_tpu.kernels.pallas_packet import env_on

    # A persisted raysort win flips later configs' actual traversal —
    # the label must say so (ADVICE r4 #3). Since round 5 the default
    # routing is hybrid: packet for coherent primary batches, sort
    # wavefront for in-loop bounce batches (ROADMAP round-5 decision).
    bk = "hybrid-packet/sort"
    if env_on("LUPIN_PACKET_RAYSORT"):
        bk = "hybrid-packet+raysort/sort"
    # A persisted streams win changes the dispatch shape of later configs
    # too — keep the label honest (same rule as raysort above).
    k = os.environ.get("LUPIN_SPP_STREAMS", "1")
    if k not in ("", "1"):
        bk += f"+streams{k}"
    return bk


def main():
    import jax
    # NOTE: do NOT enable jax_compilation_cache_dir here — it deadlocks with
    # the axon remote-compile backend used in this TPU sandbox.
    import jax.numpy as jnp
    import numpy as np

    from lupinpathtracer_tpu.core.types import (
        BakedPathtraceParams,
        PathtraceDesc,
        PathtraceType,
    )
    from lupinpathtracer_tpu.io import builtin
    from lupinpathtracer_tpu.render import renderer, integrators
    from lupinpathtracer_tpu.render.renderer import _camera_args
    from lupinpathtracer_tpu.core import rng as rng_mod
    from lupinpathtracer_tpu.render.camera import compute_camera_ray
    from lupinpathtracer_tpu.scene.flatten import build_scene_tpu

    ok, backend, detail = _wait_for_backend()
    if not ok:
        _emit_backend_unavailable(detail)
        return
    print(f"# jax backend: {backend}", file=sys.stderr)

    # Self-imposed wall budget: remote axon compiles run 2-10 min each and
    # the config list keeps growing — if an external timeout kills the
    # process before the single JSON line prints, the round has NO perf
    # artifact (the r3 failure mode). Skip remaining optional configs
    # once the budget is spent; the JSON line always prints.
    t_start = time.time()
    budget = float(os.environ.get("LUPIN_BENCH_BUDGET_S", "3900"))

    def over_budget(cfg):
        left = budget - (time.time() - t_start)
        if left < 0:
            print(f"# {cfg} skipped: bench time budget spent "
                  f"({budget:.0f}s)", file=sys.stderr)
            return True
        return False

    W = H = 512
    # All 64 spp in ONE dispatch: the fused megakernel regenerates paths
    # in place, so a longer spp run amortizes the per-block tail (~0.45 s,
    # safely under the TPU watchdog).
    SPP_PER_ACCUM = 64
    ACCUMS = 1
    BOUNCES = 8

    scene, cams = builtin.build_scene_cornell_box()
    tpu = build_scene_tpu(scene)
    desc = PathtraceDesc()
    desc.camera_transform = cams[0].transform
    desc.camera_params = cams[0].params
    desc.pathtrace_type = PathtraceType.STANDARD
    desc.advanced.max_radiance = 10.0
    baked = BakedPathtraceParams(max_bounces=BOUNCES, samples_per_pixel=SPP_PER_ACCUM)

    # --- measure average traced rays per camera sample (one jitted probe) ---
    cam = _camera_args(desc)

    @jax.jit
    def probe(scene):
        xs = jnp.arange(W, dtype=jnp.int32)
        ys = jnp.arange(H, dtype=jnp.int32)
        gx = jnp.broadcast_to(xs[None, :], (H, W)).reshape(-1)
        gy = jnp.broadcast_to(ys[:, None], (H, W)).reshape(-1)
        pix = (gy * W + gx).astype(jnp.uint32)
        state = rng_mod.init_state(pix, 0, 0, 0)
        state, ox = rng_mod.next_f32(state)
        state, oy = rng_mod.next_f32(state)
        state, ro, rd = compute_camera_ray(
            cam["cam_transform"], cam["lens"], cam["film"], cam["aspect"],
            cam["focus"], cam["aperture"], False,
            gx, gy, (jnp.float32(W), jnp.float32(H)),
            ox - 0.5, oy - 0.5, state,
        )
        ctx = integrators.make_ctx(scene, jnp.float32(1e-3))
        _, _, _, n_traced = integrators.pathtrace(
            scene, ctx, ro, rd, state, int(PathtraceType.STANDARD), BOUNCES
        )
        return jnp.sum(n_traced.astype(jnp.int64))

    rays_per_spp = int(probe(tpu))
    print(f"# rays_per_spp={rays_per_spp} ({rays_per_spp / (W * H):.2f} segs/path)",
          file=sys.stderr)

    # --- timed render ---
    image = renderer.new_accumulation_buffer(W, H)
    desc.accum_params.accumulate = True
    desc.accum_params.counter = 0
    image = renderer.pathtrace_scene(tpu, image, desc, baked)  # warm-up/compile
    _ = float(jnp.sum(image))  # force: block_until_ready is unreliable on axon

    REPS = 3  # repeat the full workload to amortize dispatch latency
    t0 = time.time()
    for r in range(REPS):
        for i in range(1, ACCUMS + 1):
            desc.accum_params.counter = i
            image = renderer.pathtrace_scene(tpu, image, desc, baked)
    # One sync at the end (~1 s of queued dispatches stays under the
    # watchdog); block_until_ready is unreliable on axon.
    _ = float(jnp.sum(image))
    dt = time.time() - t0
    print(f"# dt={dt:.3f}s for {REPS} reps x {ACCUMS} accums x "
          f"{SPP_PER_ACCUM} spp", file=sys.stderr)

    total_rays = rays_per_spp * SPP_PER_ACCUM * ACCUMS * REPS
    mrays = total_rays / dt / 1e6
    assert bool(np.isfinite(np.asarray(image)).all())

    # --- secondary metric: BVH wavefront path on a 456k-tri scene ---
    # (VERDICT r1 item 4: a committed Mrays/s figure for a >=100k-tri
    # scene.) Embedded in the same single JSON line the driver parses.
    # A/B: the packet backend has never been timed on hardware (VERDICT
    # r3 #1) — measure BOTH backends here and ride the winner for the
    # remaining BVH configs, so the bench never gates on an unmeasured
    # kernel (the round-3 safety-valve concern, measurement-driven).
    bvh_metric = None
    try:
        if over_budget("arealights1"):
            raise TimeoutError("bench budget")
        bvh_metric = bench_bvh_scene(ab_backends=True, persist_winner=True)
        if bvh_metric.get("ab_winner") in ("sort", "sort-wavefront"):
            os.environ["LUPIN_NO_PACKET"] = "1"
            print("# A/B: sort backend won arealights1; LUPIN_NO_PACKET=1 "
                  "for the remaining configs", file=sys.stderr)
    except Exception as e:  # missing corpus etc. — keep the headline alive
        print(f"# bvh bench skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # Third config (VERDICT r2 item 9): materials1 — 780k tris AND textured,
    # so the texture-atlas fetch path is measured, not assumed.
    mat_metric = None
    try:
        if over_budget("materials1"):
            raise TimeoutError("bench budget")
        mat_metric = bench_bvh_scene(
            name="materials1",
            metric="materials1_780ktris_textured_512x256_8bounce_8spp_bvh",
            cam_idx=0,
        )
    except Exception as e:
        print(f"# materials1 bench skipped: {type(e).__name__}: {e}",
              file=sys.stderr)

    # Fourth config (VERDICT r3 #4): the reference's multi-M-triangle
    # envelope (README.md:20-37 Bistro/Classroom class). No such asset is in
    # the corpus, so a checked-in deterministic generator builds one.
    env_metric = None
    try:
        if over_budget("terrain2M"):
            raise TimeoutError("bench budget")
        from lupinpathtracer_tpu.io.synthetic import build_scene_terrain

        env_metric = bench_bvh_scene(
            name="terrain2M",
            metric="terrain_2Mtris_512x288_8bounce_4spp_bvh",
            cam_idx=0,
            builder=lambda: build_scene_terrain(n_tris=2_000_000, seed=0),
            W=512, H=288, SPP=4,
        )
    except Exception as e:
        print(f"# terrain2M bench skipped: {type(e).__name__}: {e}",
              file=sys.stderr)

    # Fifth config (VERDICT r3 #5): the lifted instance envelope — 100k
    # instances through the packet kernel's TL_STREAM two-level mode
    # (the reference allows 1M TLAS instances, renderer.rs:317-319).
    inst_metric = None
    try:
        if over_budget("instanced100k"):
            raise TimeoutError("bench budget")
        from lupinpathtracer_tpu.io.synthetic import (
            build_scene_instanced_field,
        )

        inst_metric = bench_bvh_scene(
            name="instanced100k",
            metric="instanced_100k_512x288_8bounce_4spp_bvh",
            cam_idx=0,
            builder=lambda: build_scene_instanced_field(
                n_instances=100_000, seed=0, tris_per_mesh=64
            ),
            W=512, H=288, SPP=4,
        )
    except Exception as e:
        print(f"# instanced100k bench skipped: {type(e).__name__}: {e}",
              file=sys.stderr)

    out = {
        "metric": "cornellbox_512_8bounce_64spp_ray_throughput",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 100.0, 3),
        "backend": _traversal_backend(tpu),
    }
    if bvh_metric:
        out["bvh_secondary"] = bvh_metric
    if mat_metric:
        out["bvh_textured"] = mat_metric
    if env_metric:
        out["bvh_envelope_2M"] = env_metric
    if inst_metric:
        out["bvh_instanced_100k"] = inst_metric
    print(json.dumps(out))


def bench_bvh_scene(
    name="arealights1",
    metric="arealights1_456ktris_512x256_8bounce_8spp_bvh",
    cam_idx=1,
    builder=None,
    W=512,
    H=256,
    SPP=8,
    ab_backends=False,
    persist_winner=False,
):
    """A corpus scene through the wavefront BVH path: full paths
    (intersect + shade + NEE), honest traced-segment count.

    `builder`, if given, is a zero-arg callable returning (SceneCPU, cams)
    — used for the synthetic envelope configs that have no JSON asset.
    `ab_backends` times the render on BOTH traversal backends (default,
    then LUPIN_NO_PACKET=1 with the jit caches cleared so the retrace
    actually flips) and reports the winner. `persist_winner` additionally
    leaves the winning backend's env knob set process-wide so LATER
    configs ride it — only main() passes it (ADVICE r4 #1: a timing-noise
    win under pytest must not leak env into unrelated tests)."""

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lupinpathtracer_tpu.core.types import (
        BakedPathtraceParams,
        PathtraceDesc,
        PathtraceType,
    )
    from lupinpathtracer_tpu.io import yocto_json
    from lupinpathtracer_tpu.render import renderer, integrators
    from lupinpathtracer_tpu.render.renderer import _camera_args
    from lupinpathtracer_tpu.core import rng as rng_mod
    from lupinpathtracer_tpu.render.camera import compute_camera_ray
    from lupinpathtracer_tpu.scene.flatten import build_scene_tpu

    BOUNCES = 8

    if builder is not None:
        scene, cams = builder()
    else:
        scene, cams = yocto_json.load_scene_yoctogl_v24(
            f"/root/reference/test_scenes/{name}/{name}.json"
        )
    tpu = build_scene_tpu(scene)
    assert tpu.use_bvh and tpu.sl_count > 0
    desc = PathtraceDesc()
    desc.camera_transform = cams[cam_idx].transform
    desc.camera_params = cams[cam_idx].params
    desc.pathtrace_type = PathtraceType.STANDARD
    desc.advanced.max_radiance = 10.0
    baked = BakedPathtraceParams(max_bounces=BOUNCES, samples_per_pixel=SPP)
    cam = _camera_args(desc)

    @jax.jit
    def probe(scene):
        xs = jnp.arange(W, dtype=jnp.int32)
        ys = jnp.arange(H, dtype=jnp.int32)
        gx = jnp.broadcast_to(xs[None, :], (H, W)).reshape(-1)
        gy = jnp.broadcast_to(ys[:, None], (H, W)).reshape(-1)
        pix = (gy * W + gx).astype(jnp.uint32)
        state = rng_mod.init_state(pix, 0, 0, 0)
        state, ox = rng_mod.next_f32(state)
        state, oy = rng_mod.next_f32(state)
        state, ro, rd = compute_camera_ray(
            cam["cam_transform"], cam["lens"], cam["film"], cam["aspect"],
            cam["focus"], cam["aperture"], False,
            gx, gy, (jnp.float32(W), jnp.float32(H)),
            ox - 0.5, oy - 0.5, state,
        )
        ctx = integrators.make_ctx(scene, jnp.float32(1e-3))
        _, _, _, n_traced = integrators.pathtrace(
            scene, ctx, ro, rd, state, int(PathtraceType.STANDARD), BOUNCES
        )
        return jnp.sum(n_traced.astype(jnp.float32))

    rays_per_spp = int(probe(tpu))

    def _timed(tag):
        image = renderer.new_accumulation_buffer(W, H)
        desc.accum_params.accumulate = True
        desc.accum_params.counter = 0
        image = renderer.pathtrace_scene(tpu, image, desc, baked)
        _ = float(jnp.sum(image))
        REPS = 3
        t0 = time.time()
        for r in range(REPS):
            desc.accum_params.counter = r + 1
            image = renderer.pathtrace_scene(tpu, image, desc, baked)
        _ = float(jnp.sum(image))
        dt = time.time() - t0
        total = rays_per_spp * SPP * REPS
        mrays = total / dt / 1e6
        assert bool(np.isfinite(np.asarray(image)).all())
        bk = _traversal_backend(tpu)
        print(f"# bvh[{name}][{tag}]: dt={dt:.2f}s rays={total} "
              f"backend={bk}", file=sys.stderr)
        return mrays, bk

    mrays, bk = _timed("default")
    rec = {
        "metric": metric,
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "backend": bk,
    }
    from lupinpathtracer_tpu.render.renderer import (
        _render_pathtrace as _rp,
    )

    def _timed_env(tag, **env):
        # The jit cache doesn't key on the backend-choice env vars, so it
        # must be cleared for each retrace to actually flip (and again
        # after, so later same-signature dispatches re-trace under the
        # final env).
        olds = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        _rp.clear_cache()
        try:
            return _timed(tag)
        finally:
            for k, v in olds.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
            _rp.clear_cache()

    if ab_backends and "packet" in bk:
        # Three-way A/B: packet (as-is), packet + coherence ray sort
        # (LUPIN_PACKET_RAYSORT — bounce batches measured ~2x divergence
        # without it, prof_packet 2026-08-19), sort wavefront.
        legs = [("packet", mrays, bk)]
        try:
            m_rs, _ = _timed_env("packet+raysort", LUPIN_PACKET_RAYSORT="1")
            legs.append(("packet+raysort", m_rs, bk + "+raysort"))
            rec["ab_packet_raysort"] = round(m_rs, 2)
        except Exception as e:
            print(f"# raysort leg failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
        m_s, bk_s = _timed_env("sort", LUPIN_NO_PACKET="1")
        legs.append(("sort", m_s, bk_s))
        rec["ab_packet"] = round(mrays, 2)
        rec["ab_sort"] = round(m_s, 2)
        win = max(legs, key=lambda x: x[1])
        rec["value"] = round(win[1], 2)
        rec["backend"] = win[2]
        rec["ab_winner"] = win[0]
        if win[0] == "packet+raysort" and persist_winner:
            os.environ["LUPIN_PACKET_RAYSORT"] = "1"
            _rp.clear_cache()
            print("# A/B: packet+raysort won; LUPIN_PACKET_RAYSORT=1 for "
                  "the remaining configs", file=sys.stderr)
    from lupinpathtracer_tpu.kernels.pallas_packet import env_on

    if ab_backends and env_on("LUPIN_BENCH_AB_STREAMS"):
        # Streams A/B on top of the backend winner: K concurrent sample
        # streams per pixel would amortize fixed phase floors at K x the
        # lane memory — MEASURED A LOSER on hardware (out_hw/prof_e2e.log:
        # 2.08/1.77 vs 2.22 Mrays/s base at K=2/4 — the round phases
        # scale with lanes, there is no fixed floor to amortize), so the
        # legs are opt-in to keep the bench budget for configs.
        best_m, best_k = rec["value"], "1"
        for K in ("2", "4"):
            if int(K) >= SPP or SPP % int(K):
                continue
            try:
                m_k, _ = _timed_env(f"streams{K}", LUPIN_SPP_STREAMS=K)
                rec[f"ab_streams{K}"] = round(m_k, 2)
                if m_k > best_m:
                    best_m, best_k = m_k, K
            except Exception as e:
                print(f"# streams{K} leg failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
        if best_k != "1":
            rec["value"] = round(best_m, 2)
            rec["backend"] += f"+streams{best_k}"
            rec["ab_winner_streams"] = best_k
            if persist_winner:
                os.environ["LUPIN_SPP_STREAMS"] = best_k
                _rp.clear_cache()
                print(f"# A/B: streams{best_k} won; LUPIN_SPP_STREAMS="
                      f"{best_k} for the remaining configs", file=sys.stderr)
    return rec


if __name__ == "__main__":
    # One whole-run retry: a tunnel flap mid-run raises RuntimeError from a
    # dispatch — retry once after a pause, then emit the structured record.
    try:
        main()
    except RuntimeError as e:
        print(f"# run failed ({str(e).splitlines()[0][:200]}); retrying once",
              file=sys.stderr)
        time.sleep(60)
        try:
            main()
        except RuntimeError as e2:
            _emit_backend_unavailable(str(e2))
