"""Serving adapter for the set-prediction grasp transformer family.

One forward pass of the query decoder emits the whole grasp set — no
latent sampling, no denoising scan — so the fused device program is:
tokenize BPS once → decode n_q queries → rot6d → palm back-off →
evaluator score (folded, reference ``dexgangrasp.py:393-442`` scoring
semantics).  Same engine surface as GraspEngine/DiffusionEngine so the
MAGD protocol, filter studies, refinement and the apps can swap the
family in (``--model set``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dexgangrasp_tpu.core.grasp import Grasps
from dexgangrasp_tpu.core.rotations import rot_matrix_from_ortho6d
from dexgangrasp_tpu.core.transforms import translate_along_axis
from dexgangrasp_tpu.engine import folding
from dexgangrasp_tpu.engine import pipeline as _pipeline
from dexgangrasp_tpu.models.diffusion import split_grasp_vector
from dexgangrasp_tpu.models.grasp_transformer import GraspTransformer


@functools.partial(jax.jit, static_argnames=("model",))
def predict_and_score_set(model: GraspTransformer, params: dict,
                          eva_folded: dict, normalizer, bps: jax.Array,
                          z_offset: float = 0.025) -> Grasps:
    """bps (4096,) → the model's n_q-grasp set, evaluator-scored.

    ``Grasps.score`` is the EVALUATOR probability (so filtering keeps the
    reference thresholds' meaning across families); the decoder's own
    confidence is returned in ``Grasps.z[..., -1]`` alongside the raw
    grasp vector."""
    g, logit = model.apply(params, bps)
    if normalizer is not None:
        g = normalizer.denormalize(g)
    rot6, transl, joints = split_grasp_vector(g, model.n_joints)
    rot = rot_matrix_from_ortho6d(rot6)
    transl = translate_along_axis(transl, rot, 0, z_offset)
    n = g.shape[0]
    pose = jnp.concatenate([rot.reshape(n, 9), transl], axis=1)
    ectx = folding.evaluator_object_context(eva_folded, bps)
    score = folding.evaluator_apply_folded(eva_folded, ectx, pose)
    conf = jax.nn.sigmoid(logit)
    return Grasps(transl=transl, rot_matrix=rot, joint_conf=joints,
                  score=score,
                  z=jnp.concatenate([g, conf[:, None]], axis=1))


def predict_refine_topk_set(model: GraspTransformer, params: dict,
                            eva_folded: dict, normalizer, bps: jax.Array,
                            top_k: int, z_offset: float = 0.025,
                            refine_steps: int = 0) -> Grasps:
    """Fused set-family tail for the closed-loop frame programs
    (engine/frame_pipeline.py): decode the whole query set, optionally run
    the composed-frontier tail (evaluator-gradient ascent → SO(3)
    projection → rescore, the same stages every other family serves), then
    EXACT top-k — n_queries is tiny (16), so ``lax.top_k`` instead of the
    sampling families' ``approx_max_k``.  Traced inside jit/vmap by the
    frame programs; pure function of its inputs."""
    g = predict_and_score_set(model, params, eva_folded, normalizer, bps,
                              z_offset=z_offset)
    if refine_steps:
        from dexgangrasp_tpu.core.rotations import ortho6d_from_rot_matrix
        from dexgangrasp_tpu.engine.refine import refine_grasps_gradient

        rot, transl, joints, _ = refine_grasps_gradient(
            eva_folded, bps, g.rot_matrix, g.transl, g.joint_conf,
            num_steps=refine_steps)
        # gradient ascent steps the matrix entries raw (reference
        # :516-541) — project back to SO(3) and rescore the projected
        # pose so ranking sees what will be served
        rot = rot_matrix_from_ortho6d(ortho6d_from_rot_matrix(rot))
        n = rot.shape[0]
        pose = jnp.concatenate([rot.reshape(n, 9), transl], axis=1)
        ectx = folding.evaluator_object_context(eva_folded, bps)
        score = folding.evaluator_apply_folded(eva_folded, ectx, pose)
        g = Grasps(transl=transl, rot_matrix=rot, joint_conf=joints,
                   score=score, z=g.z)
    _, order = jax.lax.top_k(g.score, min(top_k, model.n_queries))
    return g.take(order)


class SetEngine:
    """GraspEngine-compatible façade for the set-prediction family.

    ``generate_grasps(n_samples)``: a set predictor emits a FIXED set of
    ``n_queries`` grasps per forward; when ``n_samples`` < n_queries the
    top-n by evaluator score are returned, when larger the full set is
    returned as-is (deterministic — there is no sampling axis to widen;
    coverage-style protocols see at most n_queries predictions)."""

    def __init__(self, params: dict, eva_params: dict, eva_state: dict,
                 normalizer=None, model: GraspTransformer = None,
                 basis=None, z_offset: float = 0.025, cloud_pad: int = 8192,
                 refine_steps: int = 0):
        from dexgangrasp_tpu.ops.bps import BPSEncoder

        self.model = model or GraspTransformer()
        self.params = params
        self.normalizer = normalizer
        self.eva_folded = folding.fold_evaluator(eva_params, eva_state)
        # f32 alias consumed by the shared _refine tail (GraspEngine
        # keeps a separate f32 copy in bf16 serving mode)
        self.eva_folded_f32 = self.eva_folded
        self.disc_folded = None
        self.encoder = BPSEncoder(basis=basis, cloud_pad=cloud_pad)
        self.z_offset = z_offset
        self.refine_steps = refine_steps

    @classmethod
    def from_checkpoints(cls, set_path: str, eva_path=None,
                         basis_path=None, **kw) -> "SetEngine":
        from dexgangrasp_tpu.models.diffusion import GraspNormalizer
        from dexgangrasp_tpu.ops.bps import load_basis
        from dexgangrasp_tpu.train import checkpoints as ckpt

        if set_path is None:
            model = kw.get("model") or GraspTransformer()
            trees = {"params": model.init(jax.random.PRNGKey(0))}
            normalizer = None
        else:
            trees, _ = ckpt.load_pytrees(set_path)
            normalizer = None
            if "normalizer_mean" in trees:
                normalizer = GraspNormalizer(
                    mean=trees["normalizer_mean"],
                    std=trees["normalizer_std"])
        if eva_path:
            etrees, _ = ckpt.load_pytrees(eva_path)
            ep, es = etrees["params"], etrees["state"]
        else:
            from dexgangrasp_tpu.models.networks import init_evaluator

            _, ep, es = init_evaluator(jax.random.PRNGKey(1))
        if basis_path:
            kw["basis"] = load_basis(basis_path)
        return cls(trees["params"], ep, es, normalizer=normalizer, **kw)

    def generate(self, bps, n_samples: int = None, seed=None,
                 z_offset=None) -> Grasps:
        bps = jnp.asarray(bps, jnp.float32).reshape(-1)
        zo = self.z_offset if z_offset is None else z_offset
        g = predict_and_score_set(self.model, self.params, self.eva_folded,
                                  self.normalizer, bps, z_offset=zo)
        if self.refine_steps:
            g = self._refine(bps, g)
        if n_samples is not None and n_samples < self.model.n_queries:
            _, order = jax.lax.top_k(g.score, n_samples)
            g = g.take(order)
        return g

    _refine = _pipeline.GraspEngine._refine

    def generate_grasps(self, bps, n_samples: int = None,
                        return_arr: bool = True, z_offset=None, seed=None):
        g = self.generate(bps, n_samples=n_samples, seed=seed,
                          z_offset=z_offset)
        return g.to_dict(numpy=return_arr)

    evaluate_grasps = _pipeline.GraspEngine.evaluate_grasps
    filter_grasps = _pipeline.GraspEngine.filter_grasps
