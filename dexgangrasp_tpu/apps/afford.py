"""DexAfford-Prompt online pipeline — counterpart of ``dexafford_prompt.py``.

Same closed loop as apps/realtime.py plus the VLPart/MLLM affordance
grounding stage: ``run_lmp(color_image)`` (the reference calls into the
VLPart submodule, a process/network boundary — ``dexafford_prompt.py:
149-156``) returns a part mask; grasps are ranked by distance to the part
centroid, top-30 kept, then evaluator-sorted with thresh=-1
(``:191-198``).

``run_lmp`` is an injected callable here (the VLPart/detectron2 stack and
the MLLM API stay host-side per BASELINE.json); the reference's
retry-on-Exception loop around it is preserved.
"""
from __future__ import annotations

import time
from typing import Callable, Dict

import numpy as np

from dexgangrasp_tpu.apps.mask_filter import (
    part_points_from_mask,
    rank_grasps_by_part,
    sort_grasps,
)
from dexgangrasp_tpu.apps.realtime import RealtimeConfig, RealtimePipeline

DEFAULT_TOP_K = 30  # reference dexafford_prompt.py:192


def run_lmp_with_retry(run_lmp: Callable, color_image: np.ndarray,
                       max_retries: int = 5, delay_s: float = 1.0):
    """Reference retry loop (dexafford_prompt.py:134-156)."""
    last_err = None
    for attempt in range(max_retries):
        try:
            return run_lmp(color_image)
        except Exception as e:  # noqa: BLE001 — mirror reference behavior
            last_err = e
            print(f"run_lmp failed (attempt {attempt + 1}/{max_retries}): {e}")
            time.sleep(delay_s)
    raise RuntimeError(f"run_lmp failed after {max_retries} attempts"
                       ) from last_err


class AffordancePipeline(RealtimePipeline):
    """RealtimePipeline + MLLM part grounding."""

    def __init__(self, engine, cfg: RealtimeConfig,
                 run_lmp: Callable[[np.ndarray], np.ndarray],
                 top_k: int = DEFAULT_TOP_K, **kw):
        super().__init__(engine, cfg, **kw)
        self.run_lmp = run_lmp
        self.top_k = top_k

    def step_afford(self, color_image: np.ndarray,
                    cloud: np.ndarray) -> Dict:
        """One affordance-grounded iteration.

        color_image: (H, W, 3); cloud: organized (H, W, 3) camera points.
        """
        mask = run_lmp_with_retry(self.run_lmp, color_image)
        state = self.process_cloud(cloud)
        grasps = self.engine.generate_grasps(state["bps"],
                                             self.cfg.n_samples)
        part = part_points_from_mask(cloud.reshape(-1, 3), mask,
                                     cloud.shape, state["pc_center"])
        if part.shape[0] == 0:
            print("empty part mask — falling back to evaluator-only ranking")
            filtered = self.engine.filter_grasps(state["bps"], grasps,
                                                 thresh=-1.0)
            return {"filtered": filtered, "part_centroid": None, **state}
        idx, centroid = rank_grasps_by_part(grasps, part)
        top = sort_grasps(grasps, idx, self.top_k)
        # evaluator as final ranker, keep-all (reference :198)
        filtered = self.engine.filter_grasps(state["bps"], top, thresh=-1.0)
        return {"filtered": filtered, "part_centroid": centroid, **state}
