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

- ``GraspServer(pipeline, port)`` — ThreadingHTTPServer; requests are
  funneled through ONE device worker (the pipeline's thread semantics)
  so concurrent clients cannot interleave device programs.
- ``GraspServiceClient(endpoint)`` — posts frames, returns the result
  dict (goals / filtered grasps / pc_center / ok).

Wire protocol (version 1):
  POST /grasps    body: .npz {points (N,3)|organized (H,W,3) f32,
                              seed (int)}  →
                  .npz {ok, n_obj, pc_center (3,), transl (k,3),
                        rot_matrix (k,3,3), joint_conf (k,J),
                        score (k,), goals_json (str)}
  GET  /healthz   → 200 "ok <family>"
"""
from __future__ import annotations

import io
import json
import threading
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


class GraspServer:
    """Serve a RealtimePipeline over HTTP.

    A single lock around the fused step keeps device programs ordered
    (one TPU, one stream); the HTTP layer itself is threaded so slow
    clients don't block health checks."""

    def __init__(self, pipeline, host: str = "127.0.0.1", port: int = 0,
                 pad_n: int = 16384, voxel: float = 0.006):
        self.pipeline = pipeline
        self.pad_n = pad_n
        self.voxel = voxel
        self._device_lock = threading.Lock()
        self._seed = 0
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path != "/healthz":
                    self.send_error(404)
                    return
                fam = ("diffusion"
                       if hasattr(outer.pipeline.engine, "diff_params")
                       else "gan")
                body = f"ok {fam}".encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if self.path != "/grasps":
                    self.send_error(404)
                    return
                n = int(self.headers.get("Content-Length", 0))
                try:
                    req = _unpack_npz(self.rfile.read(n))
                    out = outer._serve_one(req)
                except Exception as e:  # surface as a 400, keep serving
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

    def _serve_one(self, req: dict) -> bytes:
        cloud = np.asarray(req["points"], np.float32)
        seed = int(req["seed"]) if "seed" in req else None
        with self._device_lock:
            if seed is None:
                seed = self._seed
                self._seed += 1
            res = self.pipeline.step_fused(cloud=cloud, pad_n=self.pad_n,
                                           voxel=self.voxel, seed=seed)
        f = res["filtered"]
        return _pack_npz(
            ok=np.asarray(res["ok"]), n_obj=np.asarray(res["n_obj"]),
            pc_center=np.asarray(res["pc_center"], np.float32),
            transl=np.asarray(f["transl"], np.float32),
            rot_matrix=np.asarray(f["rot_matrix"], np.float32),
            joint_conf=np.asarray(f["joint_conf"], np.float32),
            score=np.asarray(f["score"], np.float32),
            goals_json=np.asarray(json.dumps(res["goals"])))

    def start(self) -> "GraspServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
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
                    choices=["gan", "vae", "diffusion"])
    ap.add_argument("--guidance-scale", type=float, default=0.0)
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--n-samples", type=int, default=1000)
    ap.add_argument("--num-grasps", type=int, default=10)
    args = ap.parse_args()

    engine = load_engine(args.gen, args.eva, model=args.model,
                         guidance_scale=args.guidance_scale)
    cfg = RealtimeConfig(base_T_cam=REFERENCE_BASE_T_CAM,
                         flange_T_palm=REFERENCE_FLANGE_T_PALM,
                         n_samples=args.n_samples,
                         num_grasps=args.num_grasps)
    pipe = RealtimePipeline(engine, cfg)
    server = GraspServer(pipe, host="0.0.0.0", port=args.port)
    print(f"grasp service on {server.endpoint} (family {args.model})")
    server.start()
    try:
        server._thread.join()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
