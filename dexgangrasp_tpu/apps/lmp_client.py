"""LMP (VLPart + MLLM) client — the affordance-grounding network glue.

The reference's ``run_lmp`` lives in its VLPart git submodule and is
called as a process/network boundary from ``dexafford_prompt.py:149-152``:
it receives the saved color frame and produces a part mask
(``mask_####.npy`` consumed by ``filter_grasps_given_mask.py:84``).
BASELINE.json scopes the VLPart/detectron2 stack and the MLLM itself
host/API-side; this module provides the production client for that
boundary plus a local stub server so the full affordance loop runs (and
is tested) without the heavyweight stack:

- ``LmpClient(endpoint)`` — HTTP client posting the frame + task prompt,
  receiving the part mask; drop-in for AffordancePipeline's ``run_lmp``
  injected callable (apps/afford.py).
- ``LmpStubServer`` — in-process HTTP server implementing the same
  protocol with a geometric placeholder segmenter (center-weighted
  foreground), standing in for VLPart in tests/demos.

Wire protocol (version 1): POST <endpoint>/segment with an ``.npz`` body
holding ``color`` (H, W, 3) uint8 and ``prompt`` (str); response is an
``.npz`` with ``mask`` (H, W) bool + ``part_name`` (str).
"""
from __future__ import annotations

import io
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional
from urllib.request import Request, urlopen

import numpy as np


def _pack_npz(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    return buf.getvalue()


def _unpack_npz(data: bytes) -> dict:
    return dict(np.load(io.BytesIO(data), allow_pickle=False))


class LmpClient:
    """HTTP client for a VLPart/MLLM segmentation service.

    ``client(color_image)`` returns the (H, W) bool part mask — the exact
    callable contract AffordancePipeline expects; combine with
    ``apps.afford.run_lmp_with_retry`` for the reference's retry loop.
    """

    def __init__(self, endpoint: str, prompt: str = "graspable part",
                 timeout_s: float = 30.0,
                 save_mask_path: Optional[str] = None):
        self.endpoint = endpoint.rstrip("/")
        self.prompt = prompt
        self.timeout_s = timeout_s
        # offline-replay compat: dexafford_prompt_offline.py replays
        # mask_####.npy files saved next to the color frames
        self.save_mask_path = save_mask_path
        self.last_part_name: Optional[str] = None

    def __call__(self, color_image: np.ndarray) -> np.ndarray:
        body = _pack_npz(color=np.asarray(color_image, np.uint8),
                         prompt=np.asarray(self.prompt))
        req = Request(self.endpoint + "/segment", data=body,
                      headers={"Content-Type": "application/x-npz"})
        with urlopen(req, timeout=self.timeout_s) as resp:
            if resp.status != 200:
                raise RuntimeError(f"LMP service returned {resp.status}")
            out = _unpack_npz(resp.read())
        mask = np.asarray(out["mask"], bool)
        self.last_part_name = str(out.get("part_name", ""))
        if self.save_mask_path:
            np.save(self.save_mask_path, mask)
        return mask


def _center_blob_segmenter(color: np.ndarray, prompt: str) -> np.ndarray:
    """Placeholder part segmenter: foreground = pixels whose intensity
    deviates from the border median, intersected with a centered ellipse
    (objects sit mid-frame in the rig's ROI)."""
    gray = np.asarray(color, np.float32).mean(axis=-1)
    border = np.concatenate([gray[0], gray[-1], gray[:, 0], gray[:, -1]])
    fg = np.abs(gray - np.median(border)) > 12.0
    h, w = gray.shape
    yy, xx = np.mgrid[0:h, 0:w]
    ellipse = (((yy - h / 2) / (h / 2)) ** 2
               + ((xx - w / 2) / (w / 2)) ** 2) < 0.9
    return fg & ellipse


class PartSegSegmenter:
    """Learned part segmenter (models/partseg.py) behind the segmenter
    callable contract: ``seg(color (H,W,3) uint8, prompt) -> (H,W) bool``.

    This is the repo's real-model replacement for the reference's VLPart
    stage (`dexafford_prompt.py:20,149-156`): plug into ``LmpStubServer``
    to serve it over the wire protocol, or pass directly as
    ``AffordancePipeline(run_lmp=...)`` (the prompt argument is accepted
    for wire compatibility; this model is single-part, trained by
    tools/partseg_study.py).
    """

    def __init__(self, params_or_path, threshold: float = 0.5,
                 pool: Optional[int] = None):
        if isinstance(params_or_path, (str, bytes)):
            from dexgangrasp_tpu.train.checkpoints import load_pytrees

            trees, meta = load_pytrees(params_or_path)
            self.params = trees["params"]
            self.meta = meta
        else:
            self.params = params_or_path
            self.meta = {}
        from dexgangrasp_tpu.models.partseg import POOL

        self.pool = pool or int(self.meta.get("pool", POOL))
        self.threshold = threshold
        self._jit = None

    def __call__(self, color_image: np.ndarray,
                 prompt: str = "") -> np.ndarray:
        import jax
        import jax.numpy as jnp

        from dexgangrasp_tpu.models.partseg import (
            downsample_frame, partseg_apply, upsample_mask)

        if self._jit is None:
            self._jit = jax.jit(partseg_apply)
        img, low_hw = downsample_frame(color_image, pool=self.pool)
        logits = self._jit(self.params, jnp.asarray(img)[None])
        prob = np.asarray(jax.nn.sigmoid(logits[0, ..., 0]))
        return upsample_mask(prob, low_hw,
                             np.asarray(color_image).shape[:2],
                             self.threshold, pool=self.pool)


class LmpStubServer:
    """Local stand-in for the VLPart/MLLM service (same wire protocol).

    Use as a context manager; ``.endpoint`` is the base URL."""

    def __init__(self, segmenter: Optional[Callable] = None, port: int = 0):
        seg = segmenter or _center_blob_segmenter

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 (http.server API)
                if self.path != "/segment":
                    self.send_error(404)
                    return
                n = int(self.headers.get("Content-Length", "0"))
                inp = _unpack_npz(self.rfile.read(n))
                mask = seg(inp["color"], str(inp.get("prompt", "")))
                body = _pack_npz(mask=mask,
                                 part_name=np.asarray("stub_part"))
                self.send_response(200)
                self.send_header("Content-Type", "application/x-npz")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # silence test output
                pass

        self._srv = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)

    @property
    def endpoint(self) -> str:
        return f"http://127.0.0.1:{self._srv.server_address[1]}"

    def __enter__(self) -> "LmpStubServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._srv.shutdown()
        self._srv.server_close()
