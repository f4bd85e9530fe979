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
from dexgangrasp_tpu.models.diffusion import DexDiffuser, split_grasp_vector


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
