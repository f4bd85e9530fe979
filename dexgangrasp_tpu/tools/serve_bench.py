"""Serving-daemon throughput bench: request coalescing (continuous
batching) vs serialized serving under concurrent closed-loop clients.

Stands up the real HTTP daemon (apps/serve.py) in-process, fires C
concurrent clients each running R sequential requests (the robot-side
usage model: every client blocks on its own frame), and reports
sustained requests/s + latency percentiles for ``max_batch=1``
(device lock, one program per request) vs ``max_batch=C`` (one vmapped
program per coalesced batch).

Clients post pre-cropped flat clouds (~8k points, the size a robot-side
ROI crop ships) so the wire/compression cost stays realistic without the
11 MB organized frame dominating the loopback.  The reference serves one
request at a time by construction (a single scripted CUDA process,
``dexgangrasp_real_robot.py``); coalescing is TPU-serving headroom it
has no analogue for.

Usage (on the TPU host, quiet machine, one run at a time):
    python -m dexgangrasp_tpu.tools.serve_bench [--family gan|diffusion|
        guided] [--clients 1 2 4 8] [--reqs 12] [--out runs/serve_bench.json]
"""
from __future__ import annotations

import argparse
import json
import os
import time


def build_pipeline(family: str, n_samples: int):
    import jax
    import numpy as np

    from dexgangrasp_tpu.apps.realtime import (
        RealtimeConfig,
        RealtimePipeline,
    )

    base_T_cam = np.eye(4)
    base_T_cam[:3, :3] = np.diag([1, -1, -1])
    base_T_cam[:3, 3] = [0, 0, 1.5]

    if family == "gan":
        from dexgangrasp_tpu.engine.pipeline import GraspEngine
        from dexgangrasp_tpu.models.networks import (
            init_dexgan,
            init_evaluator,
        )

        (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
        _, ep, es = init_evaluator(jax.random.PRNGKey(1))
        engine = GraspEngine(gp, gs, ep, es, cloud_pad=8192)
    elif family in ("vae", "vae_frontier"):
        from dexgangrasp_tpu.cli import load_vae_bench_engine

        engine = load_vae_bench_engine(
            refine_steps=10 if family == "vae_frontier" else 0)
    elif family in ("distill", "distill_frontier"):
        from dexgangrasp_tpu.cli import load_distill_bench_engine

        engine = load_distill_bench_engine(
            refine_steps=10 if family == "distill_frontier" else 0)
    elif family in ("set", "set_frontier"):
        from dexgangrasp_tpu.cli import load_set_bench_engine

        engine = load_set_bench_engine(
            refine_steps=10 if family == "set_frontier" else 0)
    else:
        from dexgangrasp_tpu.engine.diffusion_pipeline import DiffusionEngine

        engine = DiffusionEngine.from_checkpoints(
            None, ddim_steps=10,
            guidance_scale=10.0 if family in ("guided", "frontier")
            else 0.0,
            refine_steps=10 if family == "frontier" else 0,
            use_ddim_kernel=False)  # batched path is XLA-only anyway
    cfg = RealtimeConfig(base_T_cam=base_T_cam,
                         flange_T_palm=np.eye(4),
                         n_samples=n_samples, num_grasps=10)
    return RealtimePipeline(engine, cfg)


def make_client_cloud(rng, n=8000):
    """A pre-cropped tabletop cloud: plane patch + object blob, flat
    (N, 3) — what a robot-side client ships after its own ROI crop."""
    import numpy as np

    n_plane = n // 2
    plane = np.stack([rng.uniform(-0.25, 0.25, n_plane),
                      rng.uniform(-0.2, 0.2, n_plane),
                      np.full(n_plane, 0.9)], axis=1)
    n_obj = n - n_plane
    obj = np.stack([rng.uniform(-0.05, 0.05, n_obj),
                    rng.uniform(-0.05, 0.05, n_obj),
                    0.82 + 0.04 * rng.random(n_obj)], axis=1)
    cloud = np.concatenate([plane, obj]).astype(np.float32)
    cloud += rng.normal(size=cloud.shape).astype(np.float32) * 5e-4
    return cloud


def make_scene_cloud(rng, k: int, n=12000):
    """A pre-cropped tabletop SCENE: plane patch + K separated object
    blobs, flat (N, 3) — what a robot-side client ships to /scene."""
    import numpy as np

    n_plane = n // 2
    plane = np.stack([rng.uniform(-0.3, 0.3, n_plane),
                      rng.uniform(-0.25, 0.25, n_plane),
                      np.full(n_plane, 0.9)], axis=1)
    spots = [(-0.18, -0.12), (0.18, -0.12), (-0.18, 0.12), (0.18, 0.12)]
    n_obj = (n - n_plane) // k
    blobs = []
    for cx, cy in spots[:k]:
        blobs.append(np.stack([cx + rng.uniform(-0.04, 0.04, n_obj),
                               cy + rng.uniform(-0.04, 0.04, n_obj),
                               0.82 + 0.04 * rng.random(n_obj)], axis=1))
    cloud = np.concatenate([plane] + blobs).astype(np.float32)
    cloud += rng.normal(size=cloud.shape).astype(np.float32) * 5e-4
    return cloud


def run_load(endpoint: str, cloud, clients: int, reqs: int,
             scene_k: int = 0):
    """C concurrent closed-loop clients × R sequential requests each;
    returns (requests/s, latency list seconds).  ``scene_k`` > 0 posts
    whole-scene requests (POST /scene, K objects per frame) instead of
    single-object /grasps."""
    from concurrent.futures import ThreadPoolExecutor

    from dexgangrasp_tpu.apps.serve import GraspServiceClient

    lat = []

    def one_client(cid: int):
        cl = GraspServiceClient(endpoint, timeout_s=120.0)
        mine = []
        for r in range(reqs):
            t0 = time.perf_counter()
            if scene_k:
                outs = cl.scene(cloud, seed=cid * 1000 + r,
                                max_objects=scene_k)
                ok = any(o["ok"] for o in outs)
            else:
                ok = cl(cloud, seed=cid * 1000 + r)["ok"]
            mine.append(time.perf_counter() - t0)
            assert ok, "serving returned ok=False"
        return mine

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=clients) as ex:
        for res in ex.map(one_client, range(clients)):
            lat.extend(res)
    wall = time.perf_counter() - t0
    return clients * reqs / wall, sorted(lat)


def main():
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--family",
                    choices=("gan", "diffusion", "guided", "frontier",
                             "vae", "vae_frontier", "distill",
                             "distill_frontier", "set", "set_frontier"),
                    default="guided")
    ap.add_argument("--n-samples", type=int, default=1000)
    ap.add_argument("--clients", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--reqs", type=int, default=12)
    ap.add_argument("--window-ms", type=float, default=5.0)
    ap.add_argument("--scene", type=int, default=0, metavar="K",
                    help="bench POST /scene with K objects per frame "
                         "instead of /grasps (scene requests don't "
                         "coalesce — each is already one batched "
                         "program; only the serialized mode runs)")
    ap.add_argument("--out", default="runs/serve_bench.json")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dexgg_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from dexgangrasp_tpu.apps.serve import GraspServer

    pipe = build_pipeline(args.family, args.n_samples)
    rng = np.random.default_rng(0)
    cloud = (make_scene_cloud(rng, args.scene) if args.scene
             else make_client_cloud(rng))

    report = {"family": args.family, "n_samples": args.n_samples,
              "reqs_per_client": args.reqs,
              "window_ms": args.window_ms,
              "scene_objects": args.scene,
              "device": str(jax.devices()[0].device_kind),
              "modes": []}

    # scene requests don't coalesce (each is already one batched program)
    modes = (("serialized",) if args.scene
             else ("serialized", "coalesced"))
    for max_batch_mode in modes:
        for clients in args.clients:
            max_batch = 1 if max_batch_mode == "serialized" else clients
            with GraspServer(pipe, pad_n=8192, voxel=0.004,
                             max_batch=max_batch,
                             batch_window_ms=args.window_ms,
                             scene_max_objects=max(1, args.scene)) as srv:
                # warm every bucket shape this run will hit
                from dexgangrasp_tpu.apps.serve import GraspServiceClient

                warm = GraspServiceClient(srv.endpoint, timeout_s=600.0)
                if args.scene:
                    outs = warm.scene(cloud, seed=0,
                                      max_objects=args.scene)
                    n_found = sum(1 for o in outs if o["ok"])
                    report["objects_found"] = n_found
                else:
                    warm(cloud, seed=0)
                if max_batch > 1:
                    b = 2
                    while b <= max_batch:
                        pipe.step_fused_batch([cloud] * b, pad_n=8192,
                                              voxel=0.004,
                                              seeds=list(range(b)))
                        b *= 2
                rps, lat = run_load(srv.endpoint, cloud, clients,
                                    args.reqs, scene_k=args.scene)
            row = {"mode": max_batch_mode, "clients": clients,
                   "max_batch": max_batch,
                   "req_per_s": round(rps, 2),
                   "p50_ms": round(lat[len(lat) // 2] * 1e3, 1),
                   "p95_ms": round(lat[int(len(lat) * 0.95) - 1] * 1e3, 1)}
            if args.scene:
                row["scene_objects"] = args.scene
                row["objects_per_s"] = round(
                    rps * report.get("objects_found", 0), 2)
            report["modes"].append(row)
            print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"out": args.out}))


if __name__ == "__main__":
    main()
