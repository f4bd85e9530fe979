#!/usr/bin/env python3
"""Secondary benchmark: camera-rate closed loop (BASELINE config #5).

Simulated RealSense frame (720×1280 organized cloud) → ROI crop → voxel
decimate (host) → one fused device program: outlier removal → RANSAC
plane seg → center → BPS encode → sample N grasps → score → top-10.
Reports frames/sec (camera budget: 15 fps), serial AND double-buffered
(host prep of frame N+1 overlapped with device execution of frame N —
sustained rate bounded by max(host, device), not their sum).

Families (``--family``):
  gan          — folded cGAN tail, 10k samples (the round-2 configuration)
  diffusion    — DDIM-kernel sampler, 1000 samples
  guided       — evaluator-guided DDIM-10 (the production recipe,
                 runs/best_pipeline.json), 1000 samples
  frontier     — guided DDIM-10 + fused 10-step evaluator-gradient
                 refinement (runs/best_pipeline_refined.json)
  vae          — cVAE decoder through the GAN frame program (the decoder
                 is generator-shaped; engine loads runs/vae_study weights
                 when present), 1000 samples (VERDICT r3 next-4)
  vae_frontier — vae + fused 10-step evaluator-gradient refinement
  distill      — one-step student distilled from the guided-DDIM-10
                 teacher (train/distill.py; runs/distill_study weights),
                 1000 samples
  distill_frontier — distill + fused 10-step refinement (the distilled
                 frontier: 1 denoiser eval replaces the 10-step guided
                 scan, refinement recovers the quality tail)

Reports per-frame capture→publish latency p50/p95 alongside fps: depth-2
dispatch pipelining buys throughput by letting a frame wait one slot
behind its predecessor, so freshness and rate are separate axes
(VERDICT r3 next-3).

Not the driver metric (see bench.py); run manually for the serving story.
"""
import argparse
import json
import time

import numpy as np


def make_frame(rng, H=720, W=1280, n_objects=1):
    xs, ys = np.meshgrid(np.linspace(-0.5, 0.5, W), np.linspace(-0.4, 0.4, H))
    depth = np.full((H, W), 0.9, np.float32)
    cloud = np.stack([xs, ys, depth], axis=-1).astype(np.float32)
    # all spots inside the ROI crop (rows 200:630, cols 400:900), blobs
    # mutually separated; n_objects=1 keeps the round-2/3 single-blob frame
    spots = ([(300, 500)] if n_objects == 1 else
             [(220, 420), (220, 680), (430, 420), (430, 680)])
    for r0, c0 in spots[:n_objects]:
        cloud[r0:r0 + 180, c0:c0 + 200, 2] -= (
            0.10 + 0.03 * rng.random((180, 200))).astype(np.float32)
    cloud += rng.normal(size=cloud.shape).astype(np.float32) * 0.001
    return cloud


def build_pipeline(family: str):
    import jax

    from dexgangrasp_tpu.apps.realtime import RealtimeConfig, RealtimePipeline
    from dexgangrasp_tpu.engine.pipeline import GraspEngine
    from dexgangrasp_tpu.models.networks import init_dexgan, init_evaluator

    roi = np.zeros((720, 1280), bool)
    roi[200:630, 400:900] = True
    base_T_cam = np.eye(4)
    base_T_cam[:3, :3] = np.diag([1, -1, -1])
    base_T_cam[:3, 3] = [0, 0, 1.5]

    if family == "gan":
        n_samples = 10000
        (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
        _, ep, es = init_evaluator(jax.random.PRNGKey(1))
        engine = GraspEngine(gp, gs, ep, es, cloud_pad=16384)
    elif family in ("vae", "vae_frontier"):
        from dexgangrasp_tpu.cli import load_vae_bench_engine

        n_samples = 1000  # head-to-head with the diffusion rows
        engine = load_vae_bench_engine(
            refine_steps=10 if family == "vae_frontier" else 0)
    elif family in ("distill", "distill_frontier"):
        from dexgangrasp_tpu.cli import load_distill_bench_engine

        n_samples = 1000  # head-to-head with the diffusion rows
        engine = load_distill_bench_engine(
            refine_steps=10 if family == "distill_frontier" else 0)
    elif family in ("set", "set_frontier"):
        from dexgangrasp_tpu.cli import load_set_bench_engine

        n_samples = 1000  # ignored: the set decoder emits n_queries
        engine = load_set_bench_engine(
            refine_steps=10 if family == "set_frontier" else 0)
    else:
        from dexgangrasp_tpu.engine.diffusion_pipeline import DiffusionEngine

        n_samples = 1000
        engine = DiffusionEngine.from_checkpoints(
            None, ddim_steps=10,
            guidance_scale=10.0 if family in ("guided", "frontier")
            else 0.0,
            refine_steps=10 if family == "frontier" else 0,
            use_ddim_kernel=(jax.devices()[0].platform == "tpu"))
    cfg = RealtimeConfig(base_T_cam=base_T_cam, flange_T_palm=np.eye(4),
                         roi_mask=roi, n_samples=n_samples, num_grasps=10)
    return RealtimePipeline(engine, cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family",
                    choices=("gan", "diffusion", "guided", "frontier",
                             "vae", "vae_frontier", "distill",
                             "distill_frontier", "set", "set_frontier"),
                    default="gan",
                    help="frontier = guided DDIM-10 + fused 10-step "
                         "evaluator-gradient refinement (the composed "
                         "recipe, runs/best_pipeline_refined.json); "
                         "vae[_frontier] = cVAE decoder (+ fused "
                         "refinement) through the GAN frame program; "
                         "distill[_frontier] = one-step student distilled "
                         "from the guided-DDIM teacher (train/distill.py)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--multi", type=int, default=0, metavar="K",
                    help="whole-scene serving: put K objects in the frame "
                         "and run step_fused_multi (max_objects=K) — one "
                         "device program segments + grasps all K "
                         "(beyond-reference; VERDICT r3 next-8)")
    ap.add_argument("--depth", type=int, default=2,
                    help="in-flight device dispatches (1 = pure "
                         "double-buffer; 2 overlaps the relay's fixed "
                         "per-dispatch cost with itself)")
    ap.add_argument("--out", default=None, help="append JSON line here")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dexgg_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from dexgangrasp_tpu import native

    pipe = build_pipeline(args.family)

    rng = np.random.default_rng(0)
    # voxel 6 mm measured best in the round-2 voxel×pad study
    pad_n, voxel = 8192, 0.006

    if args.multi:
        # whole-scene serving: K objects, one device program per frame —
        # same serial/pipelined/latency protocol as the single-object path
        import math

        frame = make_frame(rng, n_objects=args.multi)
        kw = dict(pad_n=pad_n, voxel=voxel, max_objects=args.multi)
        pipe.step_fused_multi(cloud=frame, seed=0, **kw)  # compile

        # objects_found/clipped are counted from the TIMED iterations, not
        # the warmup frame: segmentation RANSAC is seed-dependent, and the
        # timed loops run seeds 1..iters (advisor r4).
        ok_counts, clip_counts = [], []
        t0 = time.perf_counter()
        for i in range(args.iters):
            outs = pipe.step_fused_multi(cloud=frame, seed=i + 1, **kw)
            ok_counts.append(sum(1 for o in outs if o["ok"]))
            clip_counts.append(sum(1 for o in outs if o.get("clipped")))
        dt_serial = (time.perf_counter() - t0) / args.iters
        n_ok, n_ok_min = max(ok_counts), min(ok_counts)
        n_clipped = max(clip_counts)

        t_capture = []

        def frame_source():
            for _ in range(args.iters):
                t_capture.append(time.perf_counter())
                yield frame

        lat = []
        pipe_ok_counts = []
        t0 = time.perf_counter()
        for res in pipe.run_fused_multi(frame_source(), pad_n=pad_n,
                                        voxel=voxel, depth=args.depth,
                                        max_objects=args.multi):
            lat.append(time.perf_counter() - t_capture[len(lat)])
            pipe_ok_counts.append(sum(1 for o in res if o["ok"]))
        n_done = len(lat)
        dt_overlap = (time.perf_counter() - t0) / n_done
        lat_sorted = sorted(lat)
        lat_p50 = lat_sorted[n_done // 2]
        lat_p95 = lat_sorted[min(n_done - 1,
                                 max(0, math.ceil(0.95 * n_done) - 1))]

        fps = 1 / dt_overlap
        result = {"metric": "closed_loop_multi_fps", "value": round(fps, 2),
                  "unit": "frames/s", "vs_baseline": round(fps / 15, 3),
                  "family": args.family, "n_objects": args.multi,
                  "objects_found": n_ok,
                  "objects_found_min": n_ok_min,
                  "objects_found_pipelined": (min(pipe_ok_counts),
                                              max(pipe_ok_counts)),
                  "objects_clipped": n_clipped,
                  "object_rate_per_s": round(fps * n_ok, 2),
                  "serial_fps": round(1 / dt_serial, 2),
                  "depth": args.depth,
                  "latency_p50_ms": round(lat_p50 * 1000, 2),
                  "latency_p95_ms": round(lat_p95 * 1000, 2),
                  "native_host_ops": native.available()}
        print(json.dumps(result))
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(result) + "\n")
        return

    frame = make_frame(rng)

    # warmup/compile
    pipe.step_fused(cloud=frame, pad_n=pad_n, voxel=voxel, seed=0)

    # serial: host prep + device program back to back per frame
    t0 = time.perf_counter()
    for i in range(args.iters):
        pipe.step_fused(cloud=frame, pad_n=pad_n, voxel=voxel, seed=i + 1)
    dt_serial = (time.perf_counter() - t0) / args.iters

    # overlapped: double-buffered (VERDICT r2 next-3), with per-frame
    # capture→publish latency.  "Capture" = the moment run_fused pulls the
    # frame from the source (where a camera hands it over); "publish" = the
    # moment its result is emitted.  Depth-2 pipelining trades freshness
    # for rate — this measures both axes (VERDICT r3 next-3).
    t_capture = []

    def frame_source():
        for _ in range(args.iters):
            t_capture.append(time.perf_counter())
            yield frame

    lat = []
    t0 = time.perf_counter()
    for res in pipe.run_fused(frame_source(), pad_n=pad_n, voxel=voxel,
                              depth=args.depth):
        lat.append(time.perf_counter() - t_capture[len(lat)])
    n_done = len(lat)
    dt_overlap = (time.perf_counter() - t0) / n_done
    import math

    lat_sorted = sorted(lat)
    lat_p50 = lat_sorted[n_done // 2]
    # nearest-rank p95 (ceil, not floor: at n=10 the p95 IS the max —
    # with depth-2 pipelining that max is exactly the stale-frame case
    # this metric exists to expose)
    lat_p95 = lat_sorted[min(n_done - 1,
                             max(0, math.ceil(0.95 * n_done) - 1))]

    # host-prep-only cost, for the max(host, device) bound
    t0 = time.perf_counter()
    for _ in range(args.iters):
        pipe._prep_frame(frame, pad_n, voxel)
    dt_host = (time.perf_counter() - t0) / args.iters

    fps = 1 / dt_overlap
    result = {"metric": "closed_loop_fps", "value": round(fps, 2),
              "unit": "frames/s", "vs_baseline": round(fps / 15, 3),
              "family": args.family,
              "serial_fps": round(1 / dt_serial, 2),
              "depth": args.depth,
              "latency_p50_ms": round(lat_p50 * 1000, 2),
              "latency_p95_ms": round(lat_p95 * 1000, 2),
              "host_prep_ms": round(dt_host * 1000, 2),
              "native_host_ops": native.available()}
    print(json.dumps(result))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
