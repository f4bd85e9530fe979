"""Grasp-serving daemon — the deployment boundary for the TPU host.

The reference deploys its live loop as one process on the robot host,
reaching CUDA over PCIe (``dexgangrasp_real_robot.py``).  On the TPU
stack the accelerator typically lives on its own host, so the natural
production topology is a *service*: the robot-side client ships a camera
frame (or a pre-cropped cloud), the TPU-side server runs the fused frame
program (any generator family, including guided DDIM — the same
``RealtimePipeline`` the in-process loop uses) and returns the flange
goals + top-k grasps.  Same wire style as the LMP boundary the reference
already crosses (``apps/lmp_client.py``).

- ``GraspServer(pipeline, port)`` — ThreadingHTTPServer; up to
  ``max_inflight`` (default 2) device dispatches overlap to cover the
  transport's fixed per-dispatch cost (XLA serializes the device
  programs themselves on the one TPU stream).  With ``max_batch>1`` the
  device workers COALESCE concurrent requests into one vmapped device
  program (continuous batching — throughput under load scales past
  1/latency while a lone request pays ≤ the batch window).
- ``GraspServiceClient(endpoint)`` — posts frames, returns the result
  dict (goals / filtered grasps / pc_center / ok).

Wire protocol (version 1):
  POST /grasps    body: .npz {points (N,3)|organized (H,W,3) f32,
                              seed (int)}  →
                  .npz {ok, n_obj, pc_center (3,), transl (k,3),
                        rot_matrix (k,3,3), joint_conf (k,J),
                        score (k,), goals_json (str)}
  GET  /healthz   → 200 "ok <family>"
  GET  /stats     → 200 JSON {uptime_s, requests, errors, not_ok_frames,
                              max_batch, reloads, batch_size_hist,
                              p50_ms, p95_ms}
  POST /reload    body: JSON {gen?, eva?} (server-side checkpoint paths)
                  → 200 JSON {ok, family} — hot weight swap, no restart
                  (requires an engine_factory; 501 otherwise)
"""
from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.request import Request, urlopen

import numpy as np


def _pack_npz(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    return buf.getvalue()


def _unpack_npz(data: bytes) -> dict:
    return dict(np.load(io.BytesIO(data), allow_pickle=False))


def _family_name(engine) -> str:
    """The wire-visible family label (/healthz, /reload) for an engine:
    mirrors RealtimePipeline's dispatch seam (apps/realtime.py
    ``_is_set_engine``)."""
    if hasattr(engine, "diff_params"):
        return "diffusion"
    if hasattr(engine, "gen_folded"):
        return "gan"
    return "set"


class GraspServer:
    """Serve a RealtimePipeline over HTTP.

    ``max_batch=1`` (default): each request runs its own fused step;
    up to ``max_inflight`` (default 2) dispatches overlap to cover the
    transport's fixed per-dispatch cost (requests are independent and
    XLA serializes the device programs themselves).  The HTTP layer is
    threaded so slow clients don't block health checks.

    ``max_batch>1`` turns on request coalescing (continuous batching):
    each handler thread host-preps its own frame, then enqueues it for a
    single device worker that gathers up to ``max_batch`` requests
    arriving within ``batch_window_ms`` of the first and serves them as
    ONE vmapped device program (``frames_to_grasps_*_batch``).  Batches
    are padded up to power-of-two buckets so at most log2(max_batch)+1
    program shapes ever compile.  Under concurrent load this amortizes
    the per-program dispatch cost and fills the MXU with B×n_samples
    rows; a lone request still departs after at most the window."""

    def __init__(self, pipeline, host: str = "127.0.0.1", port: int = 0,
                 pad_n: int = 16384, voxel: float = 0.006,
                 max_batch: int = 1, batch_window_ms: float = 2.0,
                 engine_factory=None, max_inflight: int = 2,
                 scene_max_objects: int = 4,
                 scene_tabletop_prior: float = 0.25):
        self.pipeline = pipeline
        self.pad_n = pad_n
        self.voxel = voxel
        # /scene always compiles ONE program shape (max_objects is a jit
        # static arg; a client-controlled value would recompile inside
        # the device-permit region — minutes through the relay on a cold
        # shape).  Client requests for fewer objects trim the response.
        self.scene_max_objects = int(scene_max_objects)
        # same one-program-shape rule: the tabletop prior is a jit static
        # arg of the multi program, so it is a SERVER deployment knob
        # (0 disables the deepest-plane rule, e.g. for scenes where a
        # floor is visible beyond the table edge), not a request field
        self.scene_tabletop_prior = float(scene_tabletop_prior)
        # hot reload: factory(gen_path, eva_path) -> engine; the daemon
        # swaps pipeline.engine in place (POST /reload) — same program
        # shapes, so no recompile, and in-flight frames finish on the
        # old weights
        self._engine_factory = engine_factory
        self._n_reloads = 0
        self.max_batch = int(max_batch)
        self.batch_window_ms = float(batch_window_ms)
        self.max_inflight = max(1, int(max_inflight))
        # ``max_inflight`` device dispatches may overlap (requests are
        # independent, XLA serializes the programs themselves on the one
        # TPU stream; through the axon relay a ~fixed per-dispatch cost
        # dominates, so two in flight overlap it — the same depth-2
        # finding as apps/realtime.run_fused, docs/RESULTS.md).  A
        # reload swap still takes every permit, so it cannot interleave
        # with in-flight frames.
        self._device_sem = threading.BoundedSemaphore(self.max_inflight)
        self._reload_lock = threading.Lock()
        self._seed = 0
        self._seed_lock = threading.Lock()
        self._queue = None
        self._workers: list = []
        if self.max_batch > 1:
            import queue as _queue

            self._queue = _queue.Queue()
        # observability (/stats): counters + a bounded latency window,
        # one lock — handler threads record, readers snapshot
        from collections import deque

        self._stats_lock = threading.Lock()
        self._t_started = time.time()
        self._n_requests = 0
        self._n_errors = 0
        self._n_not_ok = 0
        self._batch_hist: dict = {}
        self._lat_window = deque(maxlen=1024)
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path == "/healthz":
                    body = f"ok {_family_name(outer.pipeline.engine)}".encode()
                elif self.path == "/stats":
                    body = json.dumps(outer.stats()).encode()
                else:
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if self.path == "/reload":
                    n = int(self.headers.get("Content-Length", 0))
                    try:
                        spec = json.loads(self.rfile.read(n) or b"{}")
                        out = json.dumps(outer.reload_weights(
                            gen=spec.get("gen"),
                            eva=spec.get("eva"))).encode()
                    except Exception as e:
                        self.send_error(
                            501 if isinstance(e, NotImplementedError)
                            else 400, str(e)[:200])
                        return
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(out)))
                    self.end_headers()
                    self.wfile.write(out)
                    return
                if self.path not in ("/grasps", "/scene"):
                    self.send_error(404)
                    return
                n = int(self.headers.get("Content-Length", 0))
                try:
                    req = _unpack_npz(self.rfile.read(n))
                    out = (outer._serve_scene(req)
                           if self.path == "/scene"
                           else outer._serve_one(req))
                except Exception as e:  # surface as a 400, keep serving
                    with outer._stats_lock:
                        outer._n_errors += 1
                    self.send_error(400, str(e)[:200])
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/x-npz")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_port
        self.endpoint = f"http://{host}:{self.port}"
        self._thread: Optional[threading.Thread] = None

    def _next_seed(self) -> int:
        with self._seed_lock:
            s = self._seed
            self._seed += 1
        return s

    def reload_weights(self, gen: Optional[str] = None,
                       eva: Optional[str] = None) -> dict:
        """Swap serving weights without restarting (POST /reload).

        Builds a fresh engine via the injected ``engine_factory(gen,
        eva)`` (checkpoint paths are SERVER-side — this is a trusted
        robot-LAN service, same trust model as the reference's scp push,
        ``realsense.py:145-146``), then swaps ``pipeline.engine``
        after draining every in-flight permit (reloads themselves
        serialize on a dedicated lock).  Program shapes are unchanged, so the
        jitted frame programs re-run with the new weight arrays with no
        recompilation; a frame already in flight completes on the old
        weights."""
        if self._engine_factory is None:
            raise NotImplementedError("server started without an "
                                      "engine_factory; reload disabled")
        engine = self._engine_factory(gen, eva)
        # serialize reloads (two concurrent drains would each hold part
        # of the permits and deadlock), then drain every in-flight
        # permit before swapping
        with self._reload_lock:
            for _ in range(self.max_inflight):
                self._device_sem.acquire()
            try:
                self.pipeline.engine = engine
            finally:
                for _ in range(self.max_inflight):
                    self._device_sem.release()
        with self._stats_lock:
            self._n_reloads += 1
        return {"ok": True, "family": _family_name(engine),
                "gen": gen, "eva": eva}

    def stats(self) -> dict:
        """Serving counters + latency percentiles over the last ≤1024
        requests (the /stats wire payload)."""
        with self._stats_lock:
            lat = sorted(self._lat_window)
            snap = {
                "uptime_s": round(time.time() - self._t_started, 1),
                "requests": self._n_requests,
                "errors": self._n_errors,
                "not_ok_frames": self._n_not_ok,
                "max_batch": self.max_batch,
                "reloads": self._n_reloads,
                "batch_size_hist": dict(sorted(self._batch_hist.items())),
            }
        if lat:
            import math

            snap["p50_ms"] = round(lat[len(lat) // 2] * 1e3, 1)
            # nearest-rank (ceil) p95 — int(n*0.95)-1 understates at
            # small n (reports p90 at n=10)
            snap["p95_ms"] = round(
                lat[min(len(lat) - 1,
                        max(0, math.ceil(0.95 * len(lat)) - 1))] * 1e3, 1)
        return snap

    def _serve_one(self, req: dict) -> bytes:
        t0 = time.perf_counter()
        cloud = np.asarray(req["points"], np.float32)
        seed = int(req["seed"]) if "seed" in req else self._next_seed()
        # errors are counted exactly once, by the HTTP handler's except
        # (which also covers request-parse failures) — not here (ADVICE r3)
        if self._queue is not None:
            res = self._serve_coalesced(cloud, seed)
        else:
            # host prep outside the device permit (mirrors the coalesced
            # path): with max_inflight=2, concurrent requests' prep should
            # parallelize instead of serializing against device slots
            padded, n_valid = self.pipeline._prep_frame(cloud, self.pad_n,
                                                        self.voxel)
            with self._device_sem:
                res = self.pipeline._finalize_frame(
                    self.pipeline._launch_frame(padded, n_valid, seed))
            with self._stats_lock:
                self._batch_hist[1] = self._batch_hist.get(1, 0) + 1
        with self._stats_lock:
            self._n_requests += 1
            self._n_not_ok += 0 if res["ok"] else 1
            self._lat_window.append(time.perf_counter() - t0)
        f = res["filtered"]
        return _pack_npz(
            ok=np.asarray(res["ok"]), n_obj=np.asarray(res["n_obj"]),
            pc_center=np.asarray(res["pc_center"], np.float32),
            transl=np.asarray(f["transl"], np.float32),
            rot_matrix=np.asarray(f["rot_matrix"], np.float32),
            joint_conf=np.asarray(f["joint_conf"], np.float32),
            score=np.asarray(f["score"], np.float32),
            goals_json=np.asarray(json.dumps(res["goals"])))

    def _serve_scene(self, req: dict) -> bytes:
        """Whole-scene request (POST /scene): one frame in, up to
        ``max_objects`` per-object grasp sets out — ONE device program
        segments every object (plane removal → Euclidean clustering →
        per-object BPS → batched sampling; engine/frame_pipeline.py
        ``frame_to_grasps_multi``).  Scene requests don't coalesce (each
        is already a batched program); they share the device permits with
        the per-object path.  Beyond-reference capability (the reference
        serves one segmented object per process-invocation,
        ``dexafford_prompt.py:130-181``)."""
        t0 = time.perf_counter()
        cloud = np.asarray(req["points"], np.float32)
        seed = int(req["seed"]) if "seed" in req else self._next_seed()
        # the program always runs at the server's compiled max_objects;
        # the client's value only trims the response (see __init__)
        k_req = min(int(req.get("max_objects", self.scene_max_objects)),
                    self.scene_max_objects)
        padded, n_valid = self.pipeline._prep_frame(cloud, self.pad_n,
                                                    self.voxel)
        # permit held only for launch + materialize; goals assembly is
        # host work and runs outside it (same rule as _serve_one's prep)
        with self._device_sem:
            mat = self.pipeline._materialize_frame_batch(
                self.pipeline._launch_frame_multi(
                    padded, n_valid, seed,
                    max_objects=self.scene_max_objects,
                    tabletop_prior=self.scene_tabletop_prior))
        results = self.pipeline._assemble_result_batch(mat, publish=False)
        results = results[:max(1, k_req)]
        with self._stats_lock:
            self._n_requests += 1
            # a scene with NO object found is the not-ok case (empty
            # trailing slots are normal, not failures)
            self._n_not_ok += 0 if any(r["ok"] for r in results) else 1
            self._lat_window.append(time.perf_counter() - t0)
        f = {k: np.stack([np.asarray(r["filtered"][k], np.float32)
                          for r in results])
             for k in ("transl", "rot_matrix", "joint_conf", "score")}
        return _pack_npz(
            ok=np.asarray([r["ok"] for r in results]),
            n_obj=np.asarray([r["n_obj"] for r in results]),
            pc_center=np.stack([np.asarray(r["pc_center"], np.float32)
                                for r in results]),
            goals_json=np.asarray(json.dumps([r["goals"]
                                              for r in results])),
            **f)

    # ------------------------------------------ request coalescing path

    def _serve_coalesced(self, cloud: np.ndarray, seed: int) -> dict:
        """Host-prep on THIS handler thread (prep parallelizes across
        clients; the native pass releases the GIL), then hand the prepped
        frame to the device worker and wait for its slot's result."""
        from concurrent.futures import Future

        padded, n_valid = self.pipeline._prep_frame(cloud, self.pad_n,
                                                    self.voxel)
        fut: Future = Future()
        self._queue.put((padded, n_valid, seed, fut))
        # generous bound: covers a cold bucket-shape compile on a loaded
        # host; normal requests complete in tens of ms
        return fut.result(timeout=600.0)

    def _batch_worker(self) -> None:
        """Batch worker (``max_inflight`` of these run): gather → pad to
        bucket → one program; a second worker lets batch N+1 gather and
        dispatch while batch N's transfer drains."""
        import queue as _queue

        while True:
            item = self._queue.get()
            if item is None:  # shutdown sentinel
                return
            batch = [item]
            deadline = (time.perf_counter()
                        + self.batch_window_ms / 1e3)
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except _queue.Empty:
                    break
                if nxt is None:
                    self._run_batch(batch)
                    return
                batch.append(nxt)
            self._run_batch(batch)

    def _run_batch(self, batch: list) -> None:
        b = len(batch)
        with self._stats_lock:
            self._batch_hist[b] = self._batch_hist.get(b, 0) + 1
        bucket = 1
        while bucket < b:
            bucket *= 2
        try:
            padded = np.stack([it[0] for it in batch]
                              + [batch[-1][0]] * (bucket - b))
            n_valid = np.asarray([it[1] for it in batch]
                                 + [batch[-1][1]] * (bucket - b))
            seeds = [it[2] for it in batch] + [0] * (bucket - b)
            # permit held only for launch + materialize; per-slot goals
            # assembly happens outside it on this worker thread
            with self._device_sem:
                mat = self.pipeline._materialize_frame_batch(
                    self.pipeline._launch_frame_batch(padded, n_valid,
                                                      seeds))
            results = self.pipeline._assemble_result_batch(mat,
                                                           publish=False)
            for (_, _, _, fut), res in zip(batch, results):
                fut.set_result(res)
        except Exception as e:
            for _, _, _, fut in batch:
                if not fut.done():
                    fut.set_exception(e)

    def start(self) -> "GraspServer":
        if self._queue is not None and not self._workers:
            # max_inflight batch workers: batch N+1 gathers/dispatches
            # while batch N's transfer drains (relay overlap)
            for _ in range(self.max_inflight):
                w = threading.Thread(target=self._batch_worker,
                                     daemon=True)
                w.start()
                self._workers.append(w)
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
        for _ in self._workers:
            self._queue.put(None)
        for w in self._workers:
            w.join(timeout=10)
        self._workers = []
        self._httpd.server_close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


class GraspServiceClient:
    """Robot-side client: frame in, goals + grasps out."""

    def __init__(self, endpoint: str, timeout_s: float = 30.0):
        self.endpoint = endpoint.rstrip("/")
        self.timeout_s = timeout_s

    def healthz(self) -> str:
        with urlopen(self.endpoint + "/healthz",
                     timeout=self.timeout_s) as resp:
            return resp.read().decode()

    def stats(self) -> dict:
        with urlopen(self.endpoint + "/stats",
                     timeout=self.timeout_s) as resp:
            return json.loads(resp.read().decode())

    def reload(self, gen: Optional[str] = None,
               eva: Optional[str] = None) -> dict:
        """Hot-swap the server's weights (paths resolved server-side)."""
        body = json.dumps({"gen": gen, "eva": eva}).encode()
        req = Request(self.endpoint + "/reload", data=body,
                      headers={"Content-Type": "application/json"})
        with urlopen(req, timeout=self.timeout_s) as resp:
            return json.loads(resp.read().decode())

    def __call__(self, points: np.ndarray, seed: Optional[int] = None
                 ) -> dict:
        arrays = {"points": np.asarray(points, np.float32)}
        if seed is not None:
            arrays["seed"] = np.asarray(seed)
        req = Request(self.endpoint + "/grasps", data=_pack_npz(**arrays),
                      headers={"Content-Type": "application/x-npz"})
        with urlopen(req, timeout=self.timeout_s) as resp:
            if resp.status != 200:
                raise RuntimeError(f"grasp service returned {resp.status}")
            out = _unpack_npz(resp.read())
        out["ok"] = bool(out["ok"])
        out["n_obj"] = int(out["n_obj"])
        out["goals"] = json.loads(str(out.pop("goals_json")))
        return out

    def scene(self, points: np.ndarray, seed: Optional[int] = None,
              max_objects: int = 4) -> list:
        """Whole-scene request: one frame in → list of per-object result
        dicts (empty slots have ok=False), from ONE device program."""
        arrays = {"points": np.asarray(points, np.float32),
                  "max_objects": np.asarray(max_objects)}
        if seed is not None:
            arrays["seed"] = np.asarray(seed)
        req = Request(self.endpoint + "/scene", data=_pack_npz(**arrays),
                      headers={"Content-Type": "application/x-npz"})
        with urlopen(req, timeout=self.timeout_s) as resp:
            if resp.status != 200:
                raise RuntimeError(f"grasp service returned {resp.status}")
            out = _unpack_npz(resp.read())
        goals = json.loads(str(out.pop("goals_json")))
        return [{"ok": bool(out["ok"][k]), "n_obj": int(out["n_obj"][k]),
                 "pc_center": out["pc_center"][k], "goals": goals[k],
                 "filtered": {key: out[key][k] for key in
                              ("transl", "rot_matrix", "joint_conf",
                               "score")}}
                for k in range(len(goals))]


def main():
    """``python -m dexgangrasp_tpu.apps.serve --gen ... --eva ...`` —
    stand up the service on a TPU host."""
    import argparse

    from dexgangrasp_tpu.apps.realtime import (
        REFERENCE_BASE_T_CAM,
        REFERENCE_FLANGE_T_PALM,
        RealtimeConfig,
        RealtimePipeline,
    )
    from dexgangrasp_tpu.cli import load_engine

    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", default=None)
    ap.add_argument("--eva", default=None)
    ap.add_argument("--model", default="gan",
                    choices=["gan", "vae", "diffusion", "student", "set"])
    ap.add_argument("--guidance-scale", type=float, default=0.0)
    ap.add_argument("--refine-steps", type=int, default=0,
                    help="diffusion: fuse this many evaluator-gradient "
                         "refinement steps into the frame program (the "
                         "composed-frontier recipe)")
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--n-samples", type=int, default=1000)
    ap.add_argument("--num-grasps", type=int, default=10)
    ap.add_argument("--max-batch", type=int, default=1,
                    help="coalesce up to this many concurrent requests "
                         "into one device program (continuous batching)")
    ap.add_argument("--batch-window-ms", type=float, default=2.0)
    ap.add_argument("--max-inflight", type=int, default=2,
                    help="overlapping device dispatches (covers the "
                         "transport's fixed per-dispatch cost)")
    args = ap.parse_args()

    def factory(gen, eva):
        return load_engine(gen or args.gen, eva or args.eva,
                           model=args.model,
                           guidance_scale=args.guidance_scale,
                           refine_steps=args.refine_steps)

    engine = factory(None, None)
    cfg = RealtimeConfig(base_T_cam=REFERENCE_BASE_T_CAM,
                         flange_T_palm=REFERENCE_FLANGE_T_PALM,
                         n_samples=args.n_samples,
                         num_grasps=args.num_grasps)
    pipe = RealtimePipeline(engine, cfg)
    server = GraspServer(pipe, host="0.0.0.0", port=args.port,
                         max_batch=args.max_batch,
                         batch_window_ms=args.batch_window_ms,
                         engine_factory=factory,
                         max_inflight=args.max_inflight)
    print(f"grasp service on {server.endpoint} (family {args.model})")
    server.start()
    try:
        server._thread.join()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
