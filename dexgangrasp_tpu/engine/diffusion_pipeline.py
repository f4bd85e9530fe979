"""Fused inference for the diffusion generator family.

Same contract as engine/pipeline.sample_and_topk but the latents are
refined by a DDIM scan instead of one generator forward.  The evaluator
scoring/back-off/top-k stages are shared.

(The VAE family needs no pipeline of its own: its decoder is structurally
identical to DexGenerator, so ``fold_generator(vae_params['decoder'],
vae_state['decoder'])`` feeds the standard fused engine directly.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.core.grasp import Grasps
from dexgangrasp_tpu.core.rotations import rot_matrix_from_ortho6d
from dexgangrasp_tpu.core.transforms import translate_along_axis
from dexgangrasp_tpu.engine import folding
from dexgangrasp_tpu.engine import pipeline as _pipeline
from dexgangrasp_tpu.models.diffusion import DexDiffuser, split_grasp_vector


@functools.partial(jax.jit, static_argnames=("model", "n", "steps"))
def sample_and_score_diffusion(model: DexDiffuser, diff_params: dict,
                               eva_folded: dict, normalizer, bps: jax.Array,
                               key: jax.Array, n: int, steps: int = 50,
                               z_offset: float = 0.025) -> Grasps:
    """bps (4096,) → n evaluator-scored diffusion grasps (no top-k cut)."""
    g = model.sample(diff_params, bps, key, n, steps=steps)
    if normalizer is not None:
        g = normalizer.denormalize(g)
    rot6, transl, joints = split_grasp_vector(g, model.n_joints)
    rot = rot_matrix_from_ortho6d(rot6)
    transl = translate_along_axis(transl, rot, 0, z_offset)
    pose = jnp.concatenate([rot.reshape(n, 9), transl], axis=1)
    ectx = folding.evaluator_object_context(eva_folded, bps)
    score = folding.evaluator_apply_folded(eva_folded, ectx, pose)
    return Grasps(transl=transl, rot_matrix=rot, joint_conf=joints,
                  score=score, z=g)


@functools.partial(jax.jit, static_argnames=("model", "n", "top_k", "steps",
                                             "exact"))
def sample_and_topk_diffusion(model: DexDiffuser, diff_params: dict,
                              eva_folded: dict, normalizer, bps: jax.Array,
                              key: jax.Array, n: int, top_k: int,
                              steps: int = 50,
                              z_offset: float = 0.025,
                              exact: bool = False) -> Grasps:
    """bps (4096,) → top-k evaluator-scored diffusion grasps."""
    g = model.sample(diff_params, bps, key, n, steps=steps)
    if normalizer is not None:
        g = normalizer.denormalize(g)
    rot6, transl, joints = split_grasp_vector(g, model.n_joints)
    rot = rot_matrix_from_ortho6d(rot6)
    transl = translate_along_axis(transl, rot, 0, z_offset)
    pose = jnp.concatenate([rot.reshape(n, 9), transl], axis=1)
    ectx = folding.evaluator_object_context(eva_folded, bps)
    score = folding.evaluator_apply_folded(eva_folded, ectx, pose)
    if exact:
        _, order = jax.lax.top_k(score, top_k)
    else:
        _, order = jax.lax.approx_max_k(score, top_k)
    return Grasps(transl=transl, rot_matrix=rot, joint_conf=joints,
                  score=score, z=g).take(order)


class DiffusionEngine:
    """GraspEngine-compatible serving façade for the diffusion family:
    same generate_grasps / evaluate_grasps / filter_grasps surface (so the
    MAGD protocol, filter studies, and apps can swap generators), DDIM
    sampling underneath."""

    def __init__(self, diff_params: dict, eva_params: dict, eva_state: dict,
                 normalizer=None, model: DexDiffuser = None,
                 basis=None, z_offset: float = 0.025, cloud_pad: int = 8192,
                 ddim_steps: int = 50):
        from dexgangrasp_tpu.ops.bps import BPSEncoder

        self.model = model or DexDiffuser()
        self.diff_params = diff_params
        self.normalizer = normalizer
        self.eva_folded = folding.fold_evaluator(eva_params, eva_state)
        self.disc_folded = None
        self.encoder = BPSEncoder(basis=basis, cloud_pad=cloud_pad)
        self.z_offset = z_offset
        self.ddim_steps = ddim_steps
        self._key = jax.random.PRNGKey(0)

    @classmethod
    def from_checkpoints(cls, diff_path: str, eva_path=None,
                         basis_path=None, **kw) -> "DiffusionEngine":
        from dexgangrasp_tpu.models.diffusion import GraspNormalizer
        from dexgangrasp_tpu.ops.bps import load_basis
        from dexgangrasp_tpu.train import checkpoints as ckpt

        trees, _ = ckpt.load_pytrees(diff_path)
        normalizer = GraspNormalizer(mean=trees["normalizer_mean"],
                                     std=trees["normalizer_std"])
        if eva_path:
            etrees, _ = ckpt.load_pytrees(eva_path)
            ep, es = etrees["params"], etrees["state"]
        else:
            from dexgangrasp_tpu.models.networks import init_evaluator

            _, ep, es = init_evaluator(jax.random.PRNGKey(1))
        basis = load_basis(basis_path) if basis_path else None
        return cls(trees["params"], ep, es, normalizer=normalizer,
                   basis=basis, **kw)

    def _next_key(self, seed):
        if seed is not None:
            return jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        return k

    def generate(self, bps, n_samples: int, seed=None, z_offset=None
                 ) -> Grasps:
        bps = jnp.asarray(bps, jnp.float32).reshape(-1)
        return sample_and_score_diffusion(
            self.model, self.diff_params, self.eva_folded, self.normalizer,
            bps, self._next_key(seed), n_samples, steps=self.ddim_steps,
            z_offset=self.z_offset if z_offset is None else z_offset)

    def generate_grasps(self, bps, n_samples: int, return_arr: bool = True,
                        z_offset=None, seed=None):
        g = self.generate(bps, n_samples, seed=seed, z_offset=z_offset)
        return g.to_dict(numpy=return_arr)

    # evaluator-backed scoring/filtering is generator-agnostic — reuse the
    # GraspEngine implementations verbatim
    evaluate_grasps = _pipeline.GraspEngine.evaluate_grasps
    filter_grasps = _pipeline.GraspEngine.filter_grasps
