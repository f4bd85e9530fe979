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
def sample_guided(model: DexDiffuser, diff_params: dict, eva_folded: dict,
                  normalizer, bps: jax.Array, key: jax.Array, n: int,
                  steps: int = 50, guidance_scale: float = 1.0,
                  grad_clip: float = 1.0,
                  z_offset: float = 0.025,
                  g_init: jax.Array = None) -> jax.Array:
    """Evaluator-guided DDIM: (4096,) bps → (n, g_dim) normalized grasps.

    Classifier guidance (Dhariwal & Nichol, arXiv:2105.05233) with the
    trained DexEvaluator as the classifier: at each DDIM step the clean-
    grasp estimate ``g0_hat`` is nudged along ∇ log p_success — the same
    ascent direction as post-hoc refinement (engine/refine.py, reference
    ``dexgangrasp.py:619-660``) but applied *inside* the sampler, so the
    denoiser keeps every intermediate on the data manifold instead of the
    ascent walking off it after sampling ends.

    TPU-first structure: the object condition embedding AND the folded
    evaluator's per-object context are hoisted out of the scan (computed
    once); each step is matmuls + one small reverse-mode sweep, all under
    one jit.  The gradient flows through denormalize → 6D-rot Gram-Schmidt
    → palm back-off → folded evaluator, exactly the serving pose path.

    ``guidance_scale == 0`` reduces to plain DDIM (the re-derived ε is
    algebraically identical).  Gradients are per-sample norm-clipped to
    ``grad_clip`` (normalized-space units) and weighted by (1 - ᾱ_t) so
    guidance is strong while the estimate is coarse and gentle near t=0.

    ``g_init`` (n, g_dim), if given, replaces the internal N(0, I) draw —
    the DDIM trajectory is deterministic given its start, so an explicit
    start makes the (noise → endpoint) map pairable for distillation
    (train/distill.py) without relying on PRNG-call-order coupling.
    """
    cond = model.embed_object(diff_params, bps)
    ectx = folding.evaluator_object_context(eva_folded, bps)
    g = (jax.random.normal(key, (n, model.g_dim), bps.dtype)
         if g_init is None else g_init.astype(bps.dtype))
    ts = jnp.linspace(1.0, 0.0, steps + 1, dtype=bps.dtype)
    from dexgangrasp_tpu.models.diffusion import cosine_alpha_bar

    def logp_sum(g0n: jax.Array) -> jax.Array:
        gd = normalizer.denormalize(g0n) if normalizer is not None else g0n
        rot6, transl, _ = split_grasp_vector(gd, model.n_joints)
        rot = rot_matrix_from_ortho6d(rot6)
        transl = translate_along_axis(transl, rot, 0, z_offset)
        pose = jnp.concatenate([rot.reshape(n, 9), transl], axis=1)
        p = folding.evaluator_apply_folded(eva_folded, ectx, pose)
        return jnp.sum(jnp.log(p + 1e-6))

    grad_logp = jax.grad(logp_sum)

    def body(g, i):
        t_now, t_next = ts[i], ts[i + 1]
        ab_now = cosine_alpha_bar(t_now)
        ab_next = cosine_alpha_bar(t_next)
        e = model.eps(diff_params, cond, g, jnp.full((n,), t_now, g.dtype))
        g0_hat = (g - jnp.sqrt(1 - ab_now) * e) / jnp.sqrt(ab_now)
        grad = grad_logp(g0_hat)
        norm = jnp.linalg.norm(grad, axis=-1, keepdims=True)
        grad = grad * jnp.minimum(1.0, grad_clip / jnp.maximum(norm, 1e-12))
        g0_hat = g0_hat + guidance_scale * (1 - ab_now) * grad
        # re-derive ε consistent with the guided estimate so the DDIM
        # update stays an exact interpolation toward it
        e_adj = (g - jnp.sqrt(ab_now) * g0_hat) / jnp.sqrt(1 - ab_now)
        g = jnp.sqrt(ab_next) * g0_hat + jnp.sqrt(1 - ab_next) * e_adj
        return g, None

    g, _ = jax.lax.scan(body, g, jnp.arange(steps))
    return g


@functools.partial(jax.jit, static_argnames=("model", "n", "steps",
                                             "use_ddim_kernel",
                                             "cfg_weight"))
def sample_and_score_diffusion(model: DexDiffuser, diff_params: dict,
                               eva_folded: dict, normalizer, bps: jax.Array,
                               key: jax.Array, n: int, steps: int = 50,
                               z_offset: float = 0.025,
                               use_ddim_kernel: bool = False,
                               cfg_weight: float = 0.0) -> Grasps:
    """bps (4096,) → n evaluator-scored diffusion grasps (no top-k cut).

    ``use_ddim_kernel``: run the whole S-step sampler as ONE Pallas
    kernel (ops/ddim_chain.py; 1.25-1.65× on chip, within the XLA
    sampler's own matmul-precision envelope).
    ``cfg_weight`` > 0: classifier-free-guided sampling (needs a
    cfg_dropout-trained model; takes precedence over the kernel)."""
    if cfg_weight:
        g = model.sample_cfg(diff_params, bps, key, n, steps=steps,
                             w=cfg_weight)
    elif use_ddim_kernel:
        from dexgangrasp_tpu.ops.ddim_chain import ddim_sample_pallas

        g = ddim_sample_pallas(model, diff_params, bps, key, n, steps=steps)
    else:
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


@functools.partial(jax.jit, static_argnames=("model", "n", "steps"))
def sample_and_score_guided_kernel(model: DexDiffuser, diff_params: dict,
                                   eva_folded: dict, normalizer,
                                   bps: jax.Array, key: jax.Array, n: int,
                                   steps: int = 10,
                                   guidance_scale: float = 10.0,
                                   grad_clip: float = 1.0,
                                   z_offset: float = 0.025) -> Grasps:
    """The whole guided chain as ONE Pallas kernel (ops/guided_ddim.py):
    denoiser steps + in-kernel evaluator fwd/VJP guidance + final scoring,
    weights and intermediates VMEM-resident.  Same contract as
    ``sample_and_score_guided``; within the guided recursion's on-chip
    precision envelope of it (tests/test_guided_ddim.py, tools/
    guided_bench.py)."""
    from dexgangrasp_tpu.ops.guided_ddim import guided_sample_pallas

    rot, transl, joints, score, g = guided_sample_pallas(
        model, diff_params, eva_folded, normalizer, bps, key, n,
        steps=steps, guidance_scale=guidance_scale, grad_clip=grad_clip,
        z_offset=z_offset)
    if normalizer is not None:  # Grasps.z carries the denormalized vector
        g = normalizer.denormalize(g)
    return Grasps(transl=transl, rot_matrix=rot, joint_conf=joints,
                  score=score, z=g)


@functools.partial(jax.jit, static_argnames=("model", "n", "steps"))
def sample_and_score_guided(model: DexDiffuser, diff_params: dict,
                            eva_folded: dict, normalizer, bps: jax.Array,
                            key: jax.Array, n: int, steps: int = 50,
                            guidance_scale: float = 1.0,
                            grad_clip: float = 1.0,
                            z_offset: float = 0.025) -> Grasps:
    """bps (4096,) → n evaluator-GUIDED, evaluator-scored grasps."""
    g = sample_guided(model, diff_params, eva_folded, normalizer, bps, key,
                      n, steps=steps, guidance_scale=guidance_scale,
                      grad_clip=grad_clip, z_offset=z_offset)
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


@functools.partial(jax.jit, static_argnames=("model", "n"))
def sample_and_score_student(model: DexDiffuser, params: dict,
                             eva_folded: dict, normalizer, bps: jax.Array,
                             key: jax.Array, n: int,
                             z_offset: float = 0.025) -> Grasps:
    """bps (4096,) → n evaluator-scored STUDENT grasps: the distilled
    one-step sampler (models/diffusion.py ``student_x0``; trained by
    train/distill.py against the guided-DDIM teacher).

    The entire sampler is 1 denoiser eval — vs 10 denoiser evals + 10
    evaluator VJPs for the guided-DDIM-10 teacher it distills — so the
    device program collapses to: embed object once, one MLP pass over the
    n-grasp batch, pose math, evaluator scoring.  Same contract as
    ``sample_and_score_diffusion``."""
    cond = model.embed_object(params, bps)
    z = jax.random.normal(key, (n, model.g_dim), bps.dtype)
    g = model.student_x0(params, cond, z)
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


@functools.partial(jax.jit, static_argnames=("model", "n", "top_k", "steps",
                                             "refine_steps", "exact",
                                             "guidance_scale", "student"))
def sample_refine_rescore_diffusion(model: DexDiffuser, diff_params: dict,
                                    eva_folded: dict, normalizer,
                                    bps: jax.Array, key: jax.Array, n: int,
                                    top_k: int, steps: int = 50,
                                    refine_steps: int = 10,
                                    guidance_scale: float = 0.0,
                                    z_offset: float = 0.025,
                                    exact: bool = False,
                                    student: bool = False):
    """The full diffusion serving chain in ONE program: DDIM sample
    (optionally evaluator-guided) → gradient-refine by evaluator ascent →
    SO(3)-project → re-score → top-k.

    The diffusion counterpart of ``pipeline.sample_refine_rescore``; the
    measured quality ladder is docs/RESULTS.md (raw 0.67 → guided 0.96 →
    +refine 0.996 true success).  Returns (Grasps top-k sorted by refined
    score, success trajectory (refine_steps+1, n))."""
    from dexgangrasp_tpu.core.rotations import project_to_so3
    from dexgangrasp_tpu.engine.refine import refine_grasps_gradient

    if student:  # distilled one-step sampler (train/distill.py)
        g = sample_and_score_student(model, diff_params, eva_folded,
                                     normalizer, bps, key, n,
                                     z_offset=z_offset)
    elif guidance_scale:
        g = sample_and_score_guided(model, diff_params, eva_folded,
                                    normalizer, bps, key, n, steps=steps,
                                    guidance_scale=guidance_scale,
                                    z_offset=z_offset)
    else:
        g = sample_and_score_diffusion(model, diff_params, eva_folded,
                                       normalizer, bps, key, n,
                                       steps=steps, z_offset=z_offset)
    rot, transl, joints, traj = refine_grasps_gradient(
        eva_folded, bps, g.rot_matrix, g.transl, g.joint_conf,
        num_steps=refine_steps)
    rot = project_to_so3(rot)
    ectx = folding.evaluator_object_context(eva_folded, bps)
    pose = jnp.concatenate([rot.reshape(n, 9), transl], axis=1)
    score = folding.evaluator_apply_folded(eva_folded, ectx, pose)
    out = Grasps(transl=transl, rot_matrix=rot, joint_conf=joints,
                 score=score, z=g.z)
    if exact:
        _, order = jax.lax.top_k(score, top_k)
    else:
        _, order = jax.lax.approx_max_k(score, top_k)
    return out.take(order), traj


@functools.partial(jax.jit, static_argnames=("model", "n", "top_k", "steps",
                                             "exact", "guidance_scale",
                                             "student"))
def sample_and_topk_multi_diffusion(model: DexDiffuser, diff_params: dict,
                                    eva_folded: dict, normalizer,
                                    bps_batch: jax.Array, key: jax.Array,
                                    n: int, top_k: int, steps: int = 50,
                                    z_offset: float = 0.025,
                                    guidance_scale: float = 0.0,
                                    exact: bool = False,
                                    student: bool = False) -> Grasps:
    """Multi-object batched diffusion serving: (O, 4096) BPS rows →
    Grasps with leading (O, top_k) axes, one compiled program — the
    diffusion counterpart of ``pipeline.sample_and_topk_multi`` (the
    MAGD protocol / whole-scene path).  ``guidance_scale`` > 0 runs the
    evaluator-guided sampler per object; ``student`` the distilled
    one-step sampler."""
    keys = jax.random.split(key, bps_batch.shape[0])

    def per_object(bps, k):
        if student:
            g = sample_and_score_student(model, diff_params, eva_folded,
                                         normalizer, bps, k, n,
                                         z_offset=z_offset)
        elif guidance_scale:
            g = sample_and_score_guided(model, diff_params, eva_folded,
                                        normalizer, bps, k, n, steps=steps,
                                        guidance_scale=guidance_scale,
                                        z_offset=z_offset)
        else:
            g = sample_and_score_diffusion(model, diff_params, eva_folded,
                                           normalizer, bps, k, n,
                                           steps=steps, z_offset=z_offset)
        if exact:
            _, order = jax.lax.top_k(g.score, top_k)
        else:
            _, order = jax.lax.approx_max_k(g.score, top_k)
        return g.take(order)

    return jax.vmap(per_object)(bps_batch, keys)


class DiffusionEngine:
    """GraspEngine-compatible serving façade for the diffusion family:
    same generate_grasps / evaluate_grasps / filter_grasps surface (so the
    MAGD protocol, filter studies, and apps can swap generators), DDIM
    sampling underneath."""

    def __init__(self, diff_params: dict, eva_params: dict, eva_state: dict,
                 normalizer=None, model: DexDiffuser = None,
                 basis=None, z_offset: float = 0.025, cloud_pad: int = 8192,
                 ddim_steps: int = 50, guidance_scale: float = 0.0,
                 use_ddim_kernel=None, cfg_weight: float = 0.0,
                 use_guided_kernel: bool = False, refine_steps: int = 0,
                 student: bool = False):
        from dexgangrasp_tpu.ops.bps import BPSEncoder

        self.model = model or DexDiffuser()
        self.diff_params = diff_params
        self.normalizer = normalizer
        self.eva_folded = folding.fold_evaluator(eva_params, eva_state)
        # f32 alias consumed by the shared _refine tail (GraspEngine
        # keeps a separate f32 copy in bf16 serving mode)
        self.eva_folded_f32 = self.eva_folded
        self.disc_folded = None
        self.encoder = BPSEncoder(basis=basis, cloud_pad=cloud_pad)
        self.z_offset = z_offset
        self.ddim_steps = ddim_steps
        self.guidance_scale = guidance_scale
        # None = auto: the Pallas whole-sampler kernel on TPU (unguided
        # path only — guidance needs the differentiable XLA scan)
        if use_ddim_kernel is None:
            use_ddim_kernel = jax.default_backend() == "tpu"
        self.use_ddim_kernel = use_ddim_kernel
        # opt-in: the whole guided chain as one Pallas kernel
        # (ops/guided_ddim.py; on-chip A/B in tools/guided_bench.py)
        self.use_guided_kernel = use_guided_kernel
        # >0: evaluator-gradient refinement fused into the frame program
        # after sampling (the composed-frontier recipe — guided sample →
        # refine → rescore → top-k; runs/best_pipeline_refined.json)
        self.refine_steps = refine_steps
        self.cfg_weight = cfg_weight
        # distilled one-step sampler (train/distill.py checkpoints carry
        # family='distill' metadata and from_checkpoints sets this)
        self.student = student
        self._key = jax.random.PRNGKey(0)

    @classmethod
    def from_checkpoints(cls, diff_path: str, eva_path=None,
                         basis_path=None, **kw) -> "DiffusionEngine":
        from dexgangrasp_tpu.models.diffusion import GraspNormalizer
        from dexgangrasp_tpu.ops.bps import load_basis
        from dexgangrasp_tpu.train import checkpoints as ckpt

        if diff_path is None:  # untrained init (smoke/demo parity with
            # GraspEngine.from_checkpoints(None))
            model = kw.get("model") or DexDiffuser()
            trees = {"params": model.init(jax.random.PRNGKey(0))}
            normalizer = None
        else:
            trees, meta = ckpt.load_pytrees(diff_path)
            normalizer = GraspNormalizer(mean=trees["normalizer_mean"],
                                         std=trees["normalizer_std"])
            if meta.get("family") == "distill":
                kw.setdefault("student", True)
        if eva_path:
            etrees, _ = ckpt.load_pytrees(eva_path)
            ep, es = etrees["params"], etrees["state"]
        else:
            from dexgangrasp_tpu.models.networks import init_evaluator

            _, ep, es = init_evaluator(jax.random.PRNGKey(1))
        if basis_path:
            kw["basis"] = load_basis(basis_path)
        return cls(trees["params"], ep, es, normalizer=normalizer, **kw)

    def _next_key(self, seed):
        if seed is not None:
            return jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        return k

    def generate(self, bps, n_samples: int, seed=None, z_offset=None,
                 guidance_scale=None) -> Grasps:
        bps = jnp.asarray(bps, jnp.float32).reshape(-1)
        zo = self.z_offset if z_offset is None else z_offset
        gs = self.guidance_scale if guidance_scale is None else guidance_scale
        if self.student:
            g = sample_and_score_student(
                self.model, self.diff_params, self.eva_folded,
                self.normalizer, bps, self._next_key(seed), n_samples,
                z_offset=zo)
        elif gs:
            fn = (sample_and_score_guided_kernel if self.use_guided_kernel
                  else sample_and_score_guided)
            g = fn(
                self.model, self.diff_params, self.eva_folded,
                self.normalizer, bps, self._next_key(seed), n_samples,
                steps=self.ddim_steps, guidance_scale=gs, z_offset=zo)
        else:
            g = sample_and_score_diffusion(
                self.model, self.diff_params, self.eva_folded,
                self.normalizer, bps, self._next_key(seed), n_samples,
                steps=self.ddim_steps, z_offset=zo,
                use_ddim_kernel=self.use_ddim_kernel,
                cfg_weight=self.cfg_weight)
        if self.refine_steps:
            g = self._refine(bps, g)
        return g

    # fused evaluator-gradient refinement + SO(3) projection + rescore —
    # generator-agnostic, shared with the GAN/VAE engine (pipeline.py)
    _refine = _pipeline.GraspEngine._refine

    def generate_grasps(self, bps, n_samples: int, return_arr: bool = True,
                        z_offset=None, seed=None, guidance_scale=None):
        g = self.generate(bps, n_samples, seed=seed, z_offset=z_offset,
                          guidance_scale=guidance_scale)
        return g.to_dict(numpy=return_arr)

    # evaluator-backed scoring/filtering is generator-agnostic — reuse the
    # GraspEngine implementations verbatim
    evaluate_grasps = _pipeline.GraspEngine.evaluate_grasps
    filter_grasps = _pipeline.GraspEngine.filter_grasps
