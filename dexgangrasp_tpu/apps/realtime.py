"""Closed-loop real-robot pipeline — counterpart of
``dexgangrasp_real_robot.py`` (and the online ``dexafford_prompt.py``
modulo the VLPart call, which stays an injectable hook).

Per frame: camera capture → ROI crop → distance removal → plane
segmentation → base-frame z>0 crop → center → BPS encode → 400 grasps →
filter(0.80) → top-10 → cam→base→flange pose chain with a 0.16 m
intermediate back-off → publish.

Hardware adapters (camera, robot publisher) are injected interfaces;
RealSense/ROS implementations are provided behind optional imports so the
pipeline is testable with fakes (the reference hardwires both).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Protocol

import numpy as np

from dexgangrasp_tpu.apps.segmentation import PlaneSegmentation, distance_removal
from dexgangrasp_tpu.apps.mask_filter import sort_grasps

INTER_OFFSET = np.array([0.16, 0.0, 0.0])  # reference :69
DEFAULT_N_SAMPLES = 400                     # reference :143
DEFAULT_THRESH = 0.80                       # reference :150
DEFAULT_NUM_GRASPS = 10                     # reference :160

# The reference rig's calibration, shipped as drop-in defaults
# (dexgangrasp_real_robot.py:49-58: flange→palm from tf_echo
# /panda_link8 → /palm_link_robotiq; base→camera extrinsic):
REFERENCE_FLANGE_T_PALM = np.array([
    [0.0, 0.0, -1.0, 0.020],
    [0.0, 1.0, 0.0, 0.000],
    [1.0, 0.0, 0.0, 0.050],
    [0.0, 0.0, 0.0, 1.0]])
REFERENCE_BASE_T_CAM = np.array([
    [0.99993021, -0.00887332, -0.00779972, 0.31846705],
    [0.00500804, -0.27958850, 0.96010686, -1.10184744],
    [-0.01070005, -0.96007892, -0.27952455, 0.50819482],
    [0.0, 0.0, 0.0, 1.0]])
# reference ROI for the cupboard-grasping scene (:66-68)
REFERENCE_ROI = (slice(200, 630), slice(530, 930))


class Camera(Protocol):
    def capture(self) -> Dict:
        """Returns {'color': (H,W,3), 'depth': (H,W), 'points': (H,W,3)}."""


class GraspPublisher(Protocol):
    def publish(self, goals: Dict) -> None: ...


def _quat_xyzw_from_mat(R: np.ndarray) -> np.ndarray:
    from scipy.spatial.transform import Rotation

    return Rotation.from_matrix(R).as_quat()


def hom(transl: np.ndarray, rot: np.ndarray) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = rot
    T[:3, 3] = transl
    return T


def grasp_to_flange_goals(transl: np.ndarray, rot: np.ndarray,
                          pc_center: np.ndarray, base_T_cam: np.ndarray,
                          flange_T_palm: np.ndarray,
                          inter_offset: np.ndarray = INTER_OFFSET) -> Dict:
    """One grasp (camera-centroid frame) → {'inter', 'pick'} flange poses in
    the robot base frame (reference :159-196)."""
    cam_T_palm = hom(transl + pc_center, rot)
    base_T_palm = base_T_cam @ cam_T_palm
    palm_T_flange = np.linalg.inv(flange_T_palm)
    base_T_flange = base_T_palm @ palm_T_flange

    base_T_palm_inter = np.eye(4)
    base_T_palm_inter[:3, :3] = base_T_palm[:3, :3]
    base_T_palm_inter[:3, 3] = (base_T_palm[:3, 3]
                                - base_T_palm[:3, :3] @ inter_offset)
    base_T_flange_inter = base_T_palm_inter @ palm_T_flange

    def pose_dict(T):
        q = _quat_xyzw_from_mat(T[:3, :3])
        t = T[:3, 3]
        return {"position": {"x": t[0], "y": t[1], "z": t[2]},
                "orientation": {"x": q[0], "y": q[1], "z": q[2], "w": q[3]}}

    return {"inter": pose_dict(base_T_flange_inter),
            "pick": pose_dict(base_T_flange)}


@dataclasses.dataclass
class RealtimeConfig:
    base_T_cam: np.ndarray
    flange_T_palm: np.ndarray
    roi_mask: Optional[np.ndarray] = None   # (H, W) bool grasp region
    n_samples: int = DEFAULT_N_SAMPLES
    thresh: float = DEFAULT_THRESH
    num_grasps: int = DEFAULT_NUM_GRASPS
    z_clip: float = 1.2
    # extra kwargs for the fused frame program's perception front-end
    # (outlier_method/radius/knn_k/...; engine/frame_pipeline.py) — the
    # defaults are tuned for 4-6 mm voxel-decimated RealSense density
    frame_kwargs: Optional[Dict] = None


class RealtimePipeline:
    """engine + perception + pose chain; one ``step()`` per camera frame."""

    def __init__(self, engine, cfg: RealtimeConfig,
                 camera: Optional[Camera] = None,
                 publisher: Optional[GraspPublisher] = None,
                 part_ranker: Optional[Callable] = None):
        self.engine = engine
        self.cfg = cfg
        self.camera = camera
        self.publisher = publisher
        self.part_ranker = part_ranker  # DexAfford hook: grasps→sorted idx
        self.segment = PlaneSegmentation()

    def process_cloud(self, cloud: np.ndarray,
                      organized_shape=None) -> Dict:
        """Segmentation chain on one cloud (organized (H,W,3) or flat
        (N,3)); returns {'obj_points', 'pc_center', 'bps'}."""
        cfg = self.cfg
        if cloud.ndim == 3:
            mask = (cfg.roi_mask if cfg.roi_mask is not None
                    else np.ones(cloud.shape[:2], bool))
            pts = self.segment.crop_pcd_with_bbox(cloud, mask)
        else:
            pts = cloud
        pts = distance_removal(pts, 0.0, cfg.z_clip)
        obj, _ = self.segment.plane_seg_with_angle_constrain(pts)
        # base-frame z>0 crop (drop below-table returns, reference :121-128)
        base_pts = (cfg.base_T_cam[:3, :3] @ obj.T).T + cfg.base_T_cam[:3, 3]
        obj = obj[base_pts[:, 2] > 0]
        pc_center = obj.mean(axis=0)
        bps = self.engine.encode_pcd(obj - pc_center)
        return {"obj_points": obj, "pc_center": pc_center,
                "bps": np.asarray(bps)}

    def _prep_frame(self, cloud: np.ndarray, pad_n: int, voxel: float):
        """Host half of a fused frame: ROI crop + finite/z filter + voxel
        decimate + subsample + pad.  Organized frames run as ONE native
        pass (native/dexgg_host.cpp dexgg_prep_frame — a multi-pass numpy
        chain over ~200k points was a large slice of the camera budget).
        Returns (padded (pad_n, 3), n_valid)."""
        from dexgangrasp_tpu import native
        from dexgangrasp_tpu.ops.bps import PAD_VALUE, pad_cloud

        cfg = self.cfg
        if cloud.ndim == 3:
            return native.prep_frame(cloud, cfg.roi_mask, cfg.z_clip,
                                     voxel, pad_n, PAD_VALUE)
        pts = cloud[(cloud[:, 2] > 0) & (cloud[:, 2] < cfg.z_clip)]
        pts = native.voxel_downsample(pts, voxel)
        return pad_cloud(pts, pad_n), min(pts.shape[0], pad_n)

    def _is_set_engine(self) -> bool:
        """Family dispatch seam: the set-prediction engine (SetEngine) has
        neither ``gen_folded`` (cGAN/cVAE) nor ``diff_params`` (diffusion/
        student) — checked explicitly by type so a future engine can't
        silently fall through to the wrong frame program."""
        from dexgangrasp_tpu.engine.set_pipeline import SetEngine

        return isinstance(self.engine, SetEngine)

    def _launch_frame(self, padded: np.ndarray, n_valid: int, seed: int):
        """Device half of a fused frame: dispatch ONE program, return the
        pending (Grasps, center, n_obj) WITHOUT materializing — the caller
        overlaps the next frame's host prep with this device execution
        (asynchronous dispatch; np.asarray in step_fused forces
        completion)."""
        import jax
        import jax.numpy as jnp

        from dexgangrasp_tpu.engine.frame_pipeline import (
            frame_to_grasps,
            frame_to_grasps_diffusion,
            frame_to_grasps_set,
        )

        cfg = self.cfg
        key = jax.random.PRNGKey(seed)
        extra = cfg.frame_kwargs or {}
        if self._is_set_engine():  # set-prediction family
            e = self.engine
            extra = {k: v for k, v in extra.items()
                     if k not in ("use_chain_kernel", "use_ddim_kernel")}
            return frame_to_grasps_set(
                e.model, e.params, e.eva_folded, e.normalizer,
                e.encoder.basis, jnp.asarray(padded), jnp.asarray(n_valid),
                key, top_k=cfg.num_grasps, z_offset=e.z_offset,
                refine_steps=getattr(e, "refine_steps", 0), **extra)
        if hasattr(self.engine, "diff_params"):  # diffusion family
            e = self.engine
            return frame_to_grasps_diffusion(
                e.model, e.diff_params, e.eva_folded, e.normalizer,
                e.encoder.basis, jnp.asarray(padded), jnp.asarray(n_valid),
                key, n_samples=cfg.n_samples, top_k=cfg.num_grasps,
                steps=e.ddim_steps, guidance_scale=e.guidance_scale,
                z_offset=e.z_offset,
                use_ddim_kernel=e.use_ddim_kernel and not e.guidance_scale,
                refine_steps=getattr(e, "refine_steps", 0),
                student=getattr(e, "student", False),
                **extra)
        return frame_to_grasps(
            self.engine.gen_folded, self.engine.eva_folded,
            self.engine.encoder.basis, jnp.asarray(padded),
            jnp.asarray(n_valid), key,
            n_samples=cfg.n_samples, top_k=cfg.num_grasps,
            z_offset=self.engine.z_offset,
            refine_steps=getattr(self.engine, "refine_steps", 0), **extra)

    def _launch_frame_batch(self, padded: np.ndarray, n_valid: np.ndarray,
                            seeds) -> object:
        """Dispatch ONE device program for a batch of B prepped frames
        (engine/frame_pipeline.py batched variants).  ``padded`` (B, N, 3),
        ``n_valid`` (B,), ``seeds`` length-B ints.  The serving daemon's
        coalescing path (apps/serve.py) — kernels off, XLA batched."""
        import jax
        import jax.numpy as jnp

        from dexgangrasp_tpu.engine.frame_pipeline import (
            frames_to_grasps_batch,
            frames_to_grasps_diffusion_batch,
            frames_to_grasps_set_batch,
        )

        cfg = self.cfg
        keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
        extra = dict(cfg.frame_kwargs or {})
        for k in ("use_pallas", "use_chain_kernel", "use_ddim_kernel"):
            extra.pop(k, None)  # batched path is XLA-only
        if self._is_set_engine():  # set-prediction family
            e = self.engine
            return frames_to_grasps_set_batch(
                e.model, e.params, e.eva_folded, e.normalizer,
                e.encoder.basis, jnp.asarray(padded), jnp.asarray(n_valid),
                keys, top_k=cfg.num_grasps, z_offset=e.z_offset,
                refine_steps=getattr(e, "refine_steps", 0), **extra)
        if hasattr(self.engine, "diff_params"):  # diffusion family
            e = self.engine
            return frames_to_grasps_diffusion_batch(
                e.model, e.diff_params, e.eva_folded, e.normalizer,
                e.encoder.basis, jnp.asarray(padded), jnp.asarray(n_valid),
                keys, n_samples=cfg.n_samples, top_k=cfg.num_grasps,
                steps=e.ddim_steps, guidance_scale=e.guidance_scale,
                z_offset=e.z_offset,
                refine_steps=getattr(e, "refine_steps", 0),
                student=getattr(e, "student", False), **extra)
        return frames_to_grasps_batch(
            self.engine.gen_folded, self.engine.eva_folded,
            self.engine.encoder.basis, jnp.asarray(padded),
            jnp.asarray(n_valid), keys,
            n_samples=cfg.n_samples, top_k=cfg.num_grasps,
            z_offset=self.engine.z_offset,
            refine_steps=getattr(self.engine, "refine_steps", 0), **extra)

    def step_fused_batch(self, clouds, pad_n: int = 16384,
                         voxel: float = 0.004, seeds=None) -> list:
        """B frames → B result dicts through ONE fused device program.

        Host-preps each cloud, stacks, dispatches the batched program,
        and materializes ALL outputs in a single ``jax.device_get``
        (one relay round trip for the whole batch — the same rule
        ``_finalize_frame`` applies per frame)."""
        if seeds is None:
            seeds = list(range(len(clouds)))
        prepped = [self._prep_frame(c, pad_n, voxel) for c in clouds]
        padded = np.stack([p for p, _ in prepped])
        n_valid = np.asarray([n for _, n in prepped])
        return self._finalize_frame_batch(
            self._launch_frame_batch(padded, n_valid, seeds))

    def _finalize_frame_batch(self, launched) -> list:
        """Materialize a batched launch into per-frame result dicts
        (ok/goals semantics identical to ``_finalize_frame``)."""
        return self._assemble_result_batch(
            self._materialize_frame_batch(launched))

    def _materialize_frame_batch(self, launched):
        """Force a batched/whole-scene launch's outputs to host in ONE
        ``jax.device_get`` (one relay round trip for the whole batch —
        same rule as ``_materialize_frame``).  No goals building or
        publishing here: at depth > 1 a worker thread may finish out of
        order, and publishes must stay frame-ordered."""
        import jax

        g, centers, n_objs, clippeds = launched
        return jax.device_get(
            (g.to_dict(numpy=False), centers, n_objs, clippeds))

    def _assemble_result_batch(self, materialized,
                               publish: bool = True) -> list:
        """Build goals + publish from materialized batch/scene outputs
        (one result dict per batch slot / scene object).

        ``publish=False`` for daemon-served assembly: GraspServer calls
        this OUTSIDE its device permit on concurrent handler threads, so
        publishing there would interleave goals from different requests
        on the robot topic (advisor r4)."""
        filtered, centers, n_objs, clippeds = materialized
        out = []
        for b in range(centers.shape[0]):
            fb = {k: v[b] for k, v in filtered.items()}
            n_obj = int(n_objs[b])
            clipped = bool(clippeds[b])
            if n_obj == 0:
                out.append({"goals": {}, "filtered": fb,
                            "pc_center": centers[b], "n_obj": 0,
                            "ok": False, "clipped": clipped})
                continue
            goals = {}
            # the set-prediction family returns min(num_grasps, n_queries)
            # grasps — bound by what came back (mirrors _assemble_result)
            for j in range(min(self.cfg.num_grasps, len(fb["transl"]))):
                goals[str(j)] = grasp_to_flange_goals(
                    fb["transl"][j], fb["rot_matrix"][j], centers[b],
                    self.cfg.base_T_cam, self.cfg.flange_T_palm)
            if publish and self.publisher is not None:
                self.publisher.publish(goals)
            out.append({"goals": goals, "filtered": fb,
                        "pc_center": centers[b], "n_obj": n_obj,
                        "ok": True, "clipped": clipped})
        return out

    def step_fused(self, cloud: Optional[np.ndarray] = None,
                   pad_n: int = 16384, voxel: float = 0.004,
                   seed: int = 0) -> Dict:
        """Closed-loop iteration through the single fused device program
        (engine/frame_pipeline.py): host does ROI crop + voxel decimation,
        the device does segmentation→encode→sample→score→top-k in one jit.
        Serves whichever family the injected engine is: GraspEngine (cGAN)
        or DiffusionEngine (DDIM / guided DDIM — the production recipe).
        """
        if cloud is None:
            cloud = self.camera.capture()["points"]
        padded, n_valid = self._prep_frame(cloud, pad_n, voxel)
        return self._finalize_frame(self._launch_frame(padded, n_valid,
                                                       seed))

    def step_fused_multi(self, cloud: Optional[np.ndarray] = None,
                         pad_n: int = 16384, voxel: float = 0.004,
                         seed: int = 0, max_objects: int = 4,
                         cluster_radius: float = 0.02,
                         min_cluster_points: int = 30,
                         tabletop_prior: float = 0.25) -> list:
        """Whole-SCENE closed-loop iteration: one fused device program
        segments up to ``max_objects`` objects (plane removal → Euclidean
        clustering → per-object BPS) and returns a top-k grasp set per
        object — a list of per-object result dicts (``ok=False`` for
        empty slots), all outputs materialized in ONE ``jax.device_get``.

        Beyond-reference capability: the reference's apps grasp one
        segmented object per frame (``dexafford_prompt.py:130-181``)."""
        if cloud is None:
            cloud = self.camera.capture()["points"]
        padded, n_valid = self._prep_frame(cloud, pad_n, voxel)
        return self._finalize_frame_batch(self._launch_frame_multi(
            padded, n_valid, seed, max_objects=max_objects,
            cluster_radius=cluster_radius,
            min_cluster_points=min_cluster_points,
            tabletop_prior=tabletop_prior))

    def _launch_frame_multi(self, padded: np.ndarray, n_valid: int,
                            seed: int, max_objects: int = 4,
                            cluster_radius: float = 0.02,
                            min_cluster_points: int = 30,
                            tabletop_prior: float = 0.25):
        """Dispatch the whole-scene program (no materialization — the
        serving daemon holds its device permit only around launch +
        finalize, prepping outside it)."""
        import jax
        import jax.numpy as jnp

        from dexgangrasp_tpu.engine.frame_pipeline import (
            frame_to_grasps_multi,
            frame_to_grasps_multi_diffusion,
            frame_to_grasps_multi_set,
        )

        cfg = self.cfg
        key = jax.random.PRNGKey(seed)
        extra = dict(cfg.frame_kwargs or {})
        for k in ("use_pallas", "use_chain_kernel", "use_ddim_kernel",
                  "plane_first"):
            extra.pop(k, None)  # multi path is XLA, plane-first only
        common = dict(n_samples=cfg.n_samples, top_k=cfg.num_grasps,
                      max_objects=max_objects,
                      cluster_radius=cluster_radius,
                      min_cluster_points=min_cluster_points,
                      tabletop_prior=tabletop_prior,
                      refine_steps=getattr(self.engine, "refine_steps", 0),
                      **extra)
        if self._is_set_engine():  # set-prediction family
            e = self.engine
            kw = {k: v for k, v in common.items() if k != "n_samples"}
            return frame_to_grasps_multi_set(
                e.model, e.params, e.eva_folded, e.normalizer,
                e.encoder.basis, jnp.asarray(padded), jnp.asarray(n_valid),
                key, z_offset=e.z_offset, **kw)
        if hasattr(self.engine, "diff_params"):  # diffusion family
            e = self.engine
            return frame_to_grasps_multi_diffusion(
                e.model, e.diff_params, e.eva_folded, e.normalizer,
                e.encoder.basis, jnp.asarray(padded),
                jnp.asarray(n_valid), key, steps=e.ddim_steps,
                guidance_scale=e.guidance_scale, z_offset=e.z_offset,
                student=getattr(e, "student", False), **common)
        return frame_to_grasps_multi(
            self.engine.gen_folded, self.engine.eva_folded,
            self.engine.encoder.basis, jnp.asarray(padded),
            jnp.asarray(n_valid), key,
            z_offset=self.engine.z_offset, **common)

    def run_fused(self, frames, pad_n: int = 16384, voxel: float = 0.004,
                  on_result: Optional[Callable[[Dict], None]] = None,
                  depth: int = 2):
        """Sustained closed-loop serving with host/device overlap: frame
        N+1's host prep runs while frame N's device program executes
        (double-buffering — sustained rate is bounded by max(host, device)
        instead of their sum; VERDICT r2 next-3).

        The device halves (dispatch + materialize) run on ``depth``
        worker threads: through the axon relay the dispatch call itself
        blocks for most of the program's wall time (a ~fixed per-dispatch
        relay cost dominates the actual device execution —
        docs/RESULTS.md frame-roofline section), so ``depth=2`` keeps two
        dispatches in flight and overlaps that fixed cost with itself.
        XLA serializes the device programs themselves on the single TPU
        stream, and goals-building + publishing happen on the consumer
        thread at yield time, so results (and ROS publishes) stay
        strictly in frame order at any depth.  ``depth=1`` restores pure
        double-buffering.

        ``frames``: iterable of clouds (or None to pull from the camera).
        Yields one result dict per frame, in order."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        def device_half(padded, n_valid, seed):
            # dispatch + one batched transfer; NO publishing here — a
            # worker may finish out of order at depth > 1
            return self._materialize_frame(
                self._launch_frame(padded, n_valid, seed))

        def emit(fut):
            out = self._assemble_result(fut.result())
            if on_result is not None:
                on_result(out)
            return out

        with ThreadPoolExecutor(max_workers=max(1, depth)) as ex:
            pending = deque()
            seed = 0
            for cloud in frames:
                if cloud is None:
                    cloud = self.camera.capture()["points"]
                padded, n_valid = self._prep_frame(cloud, pad_n, voxel)
                pending.append(ex.submit(device_half, padded, n_valid,
                                         seed))
                seed += 1
                while len(pending) >= max(1, depth):
                    yield emit(pending.popleft())
            while pending:
                yield emit(pending.popleft())

    def run_fused_multi(self, frames, pad_n: int = 16384,
                        voxel: float = 0.004,
                        on_result: Optional[Callable[[list], None]] = None,
                        depth: int = 2, max_objects: int = 4,
                        cluster_radius: float = 0.02,
                        min_cluster_points: int = 30,
                        tabletop_prior: float = 0.25):
        """Sustained whole-SCENE closed-loop serving: ``run_fused``'s
        dispatch pipelining applied to the multi-object program — frame
        N+1's host prep overlaps frame N's device execution, and
        ``depth`` dispatches keep the relay's fixed per-dispatch cost
        overlapped with itself.  Yields one LIST of per-object result
        dicts per frame (``step_fused_multi``'s contract), strictly in
        frame order; goals building and publishing happen on the
        consumer thread at yield time.

        Beyond-reference capability: the reference's realtime loop
        grasps one segmented object per frame and has no pipelining
        (``/root/reference/inference/realsense.py:30-31``)."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        def device_half(padded, n_valid, seed):
            return self._materialize_frame_batch(self._launch_frame_multi(
                padded, n_valid, seed, max_objects=max_objects,
                cluster_radius=cluster_radius,
                min_cluster_points=min_cluster_points,
                tabletop_prior=tabletop_prior))

        def emit(fut):
            out = self._assemble_result_batch(fut.result())
            if on_result is not None:
                on_result(out)
            return out

        with ThreadPoolExecutor(max_workers=max(1, depth)) as ex:
            pending = deque()
            seed = 0
            for cloud in frames:
                if cloud is None:
                    cloud = self.camera.capture()["points"]
                padded, n_valid = self._prep_frame(cloud, pad_n, voxel)
                pending.append(ex.submit(device_half, padded, n_valid,
                                         seed))
                seed += 1
                while len(pending) >= max(1, depth):
                    yield emit(pending.popleft())
            while pending:
                yield emit(pending.popleft())

    def _materialize_frame(self, launched):
        """Force a launched frame's device results to host in ONE
        ``jax.device_get`` — through the axon relay every separate host
        materialization is its own round trip (~20-30 ms each; 7 of them
        once cost more than the whole device program)."""
        import jax

        g, center, n_obj, clipped = launched
        filtered, pc_center, n_obj, clipped = jax.device_get(
            (g.to_dict(numpy=False), center, n_obj, clipped))
        return filtered, pc_center, int(n_obj), bool(clipped)

    def _assemble_result(self, materialized) -> Dict:
        """Build goals + publish from materialized frame outputs.

        Failure detection: a frame where segmentation found NO object
        points yields NaN grasps — report ``ok=False`` with empty goals
        (and publish nothing) instead of propagating NaN poses to the
        robot.  ``clipped=True`` flags perception buffer truncation (the
        object exceeded the quarter-frame compaction cap — grasps were
        computed from a subsampled object; see frame_pipeline
        ``_segment_center_encode``)."""
        filtered, pc_center, n_obj, clipped = materialized
        if n_obj == 0:
            return {"goals": {}, "filtered": filtered,
                    "pc_center": pc_center, "n_obj": 0, "ok": False,
                    "clipped": clipped}
        goals = {}
        # the set-prediction family returns min(num_grasps, n_queries)
        # grasps — bound by what actually came back, not the config ask
        for j in range(min(self.cfg.num_grasps,
                           len(filtered["transl"]))):
            goals[str(j)] = grasp_to_flange_goals(
                filtered["transl"][j], filtered["rot_matrix"][j],
                pc_center, self.cfg.base_T_cam, self.cfg.flange_T_palm)
        if self.publisher is not None:
            self.publisher.publish(goals)
        return {"goals": goals, "filtered": filtered,
                "pc_center": pc_center, "n_obj": n_obj, "ok": True,
                "clipped": clipped}

    def _finalize_frame(self, launched) -> Dict:
        """Materialize + assemble one frame (the serial step_fused path)."""
        return self._assemble_result(self._materialize_frame(launched))

    def step(self, cloud: Optional[np.ndarray] = None) -> Dict:
        """One closed-loop iteration; returns the published goals."""
        if cloud is None:
            frame = self.camera.capture()
            cloud = frame["points"]
        state = self.process_cloud(cloud)
        grasps = self.engine.generate_grasps(state["bps"],
                                             self.cfg.n_samples)
        if self.part_ranker is not None:
            idx, _ = self.part_ranker(grasps, state)
            grasps = sort_grasps(grasps, idx, 30)
            filtered = self.engine.filter_grasps(state["bps"], grasps,
                                                 thresh=-1.0)
        else:
            filtered = self.engine.filter_grasps(state["bps"], grasps,
                                                 thresh=self.cfg.thresh)
        k = min(self.cfg.num_grasps, filtered["rot_matrix"].shape[0])
        goals = {}
        for j in range(k):
            goals[str(j)] = grasp_to_flange_goals(
                filtered["transl"][j], filtered["rot_matrix"][j],
                state["pc_center"], self.cfg.base_T_cam,
                self.cfg.flange_T_palm)
        if self.publisher is not None:
            self.publisher.publish(goals)
        return {"goals": goals, "filtered": filtered, **state}


# --------------------------------------------------- hardware adapters


class RealSenseCamera:
    """librealsense adapter (reference inference/realsense.py:30-146):
    1280×720 @ 15 fps, depth aligned to color, organized point cloud."""

    def __init__(self, width: int = 1280, height: int = 720, fps: int = 15):
        import pyrealsense2 as rs  # optional dep, hardware-only

        self._rs = rs
        self.pipeline = rs.pipeline()
        cfg = rs.config()
        cfg.enable_stream(rs.stream.depth, width, height, rs.format.z16, fps)
        cfg.enable_stream(rs.stream.color, width, height, rs.format.bgr8, fps)
        self.profile = self.pipeline.start(cfg)
        self.align = rs.align(rs.stream.color)
        self.pc = rs.pointcloud()
        self.shape = (height, width)

    def capture(self, max_retries: int = 5) -> Dict:
        """Capture one aligned frame; retries on RuntimeError like the
        reference (realsense.py:68-76 — transient USB timeouts happen)."""
        last_err = None
        for _ in range(max_retries):
            try:
                frames = self.align.process(self.pipeline.wait_for_frames())
                depth = frames.get_depth_frame()
                color = frames.get_color_frame()
                if not depth or not color:
                    continue
                points = self.pc.calculate(depth)
                verts = np.asanyarray(points.get_vertices()).view(np.float32)
                verts = verts.reshape(self.shape + (3,))
                return {"color": np.asanyarray(color.get_data()),
                        "depth": np.asanyarray(depth.get_data()),
                        "points": verts}
            except RuntimeError as e:
                last_err = e
        raise RuntimeError(f"camera capture failed after {max_retries} "
                           f"attempts") from last_err


class RosGraspPublisher:
    """rospy adapter publishing the goals dict as a string on
    ``goal_pick_pose`` (reference :103,199 ↔ scripts/pick_place.py:54)."""

    def __init__(self, topic: str = "goal_pick_pose"):
        import rospy
        from std_msgs.msg import String

        self._rospy = rospy
        self._String = String
        self.pub = rospy.Publisher(topic, String, queue_size=10)
        if not rospy.core.is_initialized():
            rospy.init_node("pose_pub")

    def publish(self, goals: Dict) -> None:
        self.pub.publish(self._String(str(goals)))
