"""The fused grasp-synthesis inference engine.

One jitted XLA program runs the whole reference inference loop
(``dexgangrasp_offline.py`` §3.3 call stack: encode → sample N latents →
generator → rot6d→matrix → palm back-off → evaluator → sort/filter) with
zero host↔device round-trips until the final (already sorted) result is
pulled.  The reference crosses the host/device boundary ≥4 times per object
and re-tiles the 4096-dim BPS row N times; here the object enters the
program once, is folded into per-object contexts (engine/folding.py), and
N grasps cost only the small per-grasp layers.

Static shapes everywhere: N is a compile-time constant per call signature,
thresholding returns a fixed-size sorted batch + validity count instead of
the reference's data-dependent boolean indexing (``dexgangrasp.py:418-435``).
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.core.grasp import Grasps
from dexgangrasp_tpu.core.rotations import rot_matrix_from_ortho6d
from dexgangrasp_tpu.core.transforms import translate_along_axis
from dexgangrasp_tpu.engine import folding
from dexgangrasp_tpu.ops.bps import BPSEncoder

DEFAULT_Z_OFFSET = 0.025  # m; reference generate_grasps default (networks.py:257)


@functools.partial(jax.jit, static_argnames=("n", "sample_uniform", "sort",
                                             "use_chain_kernel"))
def sample_and_score(gen_folded: dict, eva_folded: dict, bps: jax.Array,
                     key: jax.Array, n: int,
                     z_offset: float = DEFAULT_Z_OFFSET,
                     sample_uniform: bool = False,
                     sort: bool = True,
                     use_chain_kernel: bool = False) -> Grasps:
    """The fused program: one object BPS row → n scored, sorted grasps.

    Args:
      gen_folded/eva_folded: folded params from engine.folding.
      bps: (4096,) object encoding.
      key: PRNG key.
      n: number of grasps (static).
      z_offset: palm back-off along the rotated x-axis (reference
        networks.py:254: ``translate_along_axis(results, 0, z_offset)``).
      sample_uniform: z ~ U(-4, 4) instead of N(0, I) (networks.py:241-243).
      sort: return grasps sorted by evaluator score descending.
      use_chain_kernel: run the whole per-grasp chain (generator → rot6d →
        back-off → evaluator) as ONE Pallas kernel with every intermediate
        in VMEM (ops/grasp_chain.py) instead of the XLA layer graph.
        Bit-near identical results; measured a statistical tie with the
        XLA path on-chip (runs/chain_bench.json) — an option, not the
        default.

    Returns a ``Grasps`` batch with ``score`` filled.
    """
    latent = gen_folded["rb1"]["w1_z"].shape[0]
    # bf16 serving mode is selected by the FOLDED WEIGHTS' dtype
    # (folding.cast_folded): the 512-wide chain is HBM-bound in f32 at
    # serving batch; bf16 operands halve the traffic (+19% measured,
    # BENCH r5).  f32 islands below: PRNG draw, rot6d Gram-Schmidt,
    # palm back-off, returned Grasps (score error ≤ 1e-3 — gated in
    # bench.py and tests/test_engine.py).
    bf16 = gen_folded["rb1"]["w2"].dtype == jnp.bfloat16
    if sample_uniform:
        z = 8.0 * jax.random.uniform(key, (n, latent), jnp.float32) - 4.0
    else:
        z = jax.random.normal(key, (n, latent), jnp.float32)

    cdt = jnp.bfloat16 if bf16 else bps.dtype
    gen_ctx = folding.generator_object_context(gen_folded, bps.astype(cdt))
    eva_ctx = folding.evaluator_object_context(eva_folded, bps.astype(cdt))

    if use_chain_kernel:
        from dexgangrasp_tpu.ops.grasp_chain import grasp_chain_pallas

        n_joints = gen_folded["joint_conf"]["w"].shape[1]
        rot, transl, joints, score = grasp_chain_pallas(
            gen_folded, eva_folded, gen_ctx, eva_ctx, z, z_offset=z_offset,
            n_joints=n_joints)
    else:
        rot6, transl, joints = folding.generator_apply_folded(
            gen_folded, gen_ctx, z.astype(cdt))
        rot = rot_matrix_from_ortho6d(rot6.astype(jnp.float32))
        transl = translate_along_axis(transl.astype(jnp.float32), rot,
                                      0, z_offset)

        # row-major flatten matches the reference's rot_matrix.view(N, -1)
        pose = jnp.concatenate([rot.reshape(n, 9), transl],
                               axis=1).astype(cdt)
        score = folding.evaluator_apply_folded(
            eva_folded, eva_ctx, pose).astype(jnp.float32)
        joints = joints.astype(jnp.float32)

    g = Grasps(transl=transl, rot_matrix=rot, joint_conf=joints,
               score=score, z=z)
    if sort:
        order = jnp.argsort(-score)
        g = g.take(order)
    return g


@functools.partial(jax.jit, static_argnames=("n", "top_k", "exact",
                                             "sample_uniform",
                                             "use_chain_kernel"))
def sample_and_topk(gen_folded: dict, eva_folded: dict, bps: jax.Array,
                    key: jax.Array, n: int, top_k: int,
                    z_offset: float = DEFAULT_Z_OFFSET,
                    exact: bool = False,
                    sample_uniform: bool = False,
                    use_chain_kernel: bool = False) -> Grasps:
    """Serving variant: sample+score n grasps, return only the best
    ``top_k`` (sorted desc).

    Uses the TPU-native ``lax.approx_max_k`` (recall ≈ 0.95) by default —
    the exact full sort is the single most expensive op in the fused
    program at large n (bitonic sort ≫ the folded MLP compute); every
    consumer in the reference takes a top-k slice afterwards anyway
    (top-10 live, ``dexgangrasp_real_robot.py:160``; top-30 afford,
    ``dexafford_prompt.py:192``).  Set ``exact=True`` for strict ordering.
    """
    g = sample_and_score(gen_folded, eva_folded, bps, key, n,
                         z_offset=z_offset, sample_uniform=sample_uniform,
                         sort=False, use_chain_kernel=use_chain_kernel)
    if exact:
        _, order = jax.lax.top_k(g.score, top_k)
    else:
        _, order = jax.lax.approx_max_k(g.score, top_k)
    return g.take(order)


@functools.partial(jax.jit, static_argnames=("k", "candidates"))
def diverse_topk(score: jax.Array, transl: jax.Array, k: int,
                 min_dist: float = 0.02, candidates: int = 256) -> jax.Array:
    """Diversity-aware selection: greedy top-k by score subject to a
    minimum translation separation (a serving upgrade over the reference's
    plain top-10 slice, which often returns near-duplicate grasps — a
    failed pick's fallback should be a *different* grasp).

    Greedy over the ``candidates`` best-scored grasps: pick the best
    remaining whose distance to every already-picked grasp ≥ min_dist;
    if none qualifies, fall back to the best remaining (so exactly k are
    always returned).  Returns (k,) indices into the input arrays.
    """
    cand_scores, cand_idx = jax.lax.top_k(score, candidates)
    cand_t = transl[cand_idx]

    def body(carry, _):
        picked_mask, picked_pts, n_picked = carry
        # distance of every candidate to its nearest already-picked grasp
        d2 = jnp.sum((cand_t[:, None, :] - picked_pts[None, :, :]) ** 2,
                     axis=-1)
        slot_valid = jnp.arange(picked_pts.shape[0]) < n_picked
        min_d2 = jnp.min(jnp.where(slot_valid[None, :], d2, jnp.inf), axis=1)
        ok = (~picked_mask) & (min_d2 >= min_dist * min_dist)
        any_ok = jnp.any(ok)
        usable = jnp.where(any_ok, ok, ~picked_mask)
        # best-scored usable candidate (cand_scores sorted desc → argmax of
        # usable with score tiebreak = first usable index)
        pick = jnp.argmax(jnp.where(usable, cand_scores, -jnp.inf))
        picked_mask = picked_mask.at[pick].set(True)
        picked_pts = picked_pts.at[n_picked].set(cand_t[pick])
        return (picked_mask, picked_pts, n_picked + 1), pick

    init = (jnp.zeros((candidates,), bool),
            jnp.full((k, 3), jnp.inf, transl.dtype), jnp.asarray(0))
    _, picks = jax.lax.scan(body, init, None, length=k)
    return cand_idx[picks]


@functools.partial(jax.jit, static_argnames=("n", "top_k", "exact"))
def sample_and_topk_multi(gen_folded: dict, eva_folded: dict,
                          bps_batch: jax.Array, key: jax.Array, n: int,
                          top_k: int, z_offset: float = DEFAULT_Z_OFFSET,
                          exact: bool = False) -> Grasps:
    """Multi-object batched engine: (O, 4096) BPS rows → Grasps with
    leading (O, top_k) axes.  One compiled program serves a whole scene /
    eval sweep; the object contexts batch through the same matmuls."""
    keys = jax.random.split(key, bps_batch.shape[0])

    def per_object(bps, k):
        return sample_and_topk(gen_folded, eva_folded, bps, k, n, top_k,
                               z_offset=z_offset, exact=exact)

    return jax.vmap(per_object)(bps_batch, keys)


@functools.partial(jax.jit, static_argnames=("n", "top_k", "refine_steps",
                                             "exact"))
def sample_refine_rescore(gen_folded: dict, eva_folded: dict,
                          bps: jax.Array, key: jax.Array, n: int,
                          top_k: int, refine_steps: int = 10,
                          z_offset: float = DEFAULT_Z_OFFSET,
                          exact: bool = False):
    """The full serving chain in ONE program: sample n → score →
    gradient-refine (evaluator ascent, engine/refine.py) → re-score →
    top-k.  The reference runs refinement as a separate host loop after
    generation (``dexgangrasp.py:619-660``); fusing it keeps the grasp
    batch on device end to end.

    Returns (Grasps top-k sorted by the refined score, success trajectory
    (refine_steps+1, n) for the refinement viewer).  Refined rotations are
    projected back to SO(3) (the raw ascent leaves the manifold — same as
    the reference's direct matrix update)."""
    from dexgangrasp_tpu.core.rotations import project_to_so3
    from dexgangrasp_tpu.engine.refine import refine_grasps_gradient

    g = sample_and_score(gen_folded, eva_folded, bps, key, n,
                         z_offset=z_offset, sort=False)
    rot, transl, joints, traj = refine_grasps_gradient(
        eva_folded, bps, g.rot_matrix, g.transl, g.joint_conf,
        num_steps=refine_steps)
    rot = project_to_so3(rot)
    ctx = folding.evaluator_object_context(eva_folded, bps)
    pose = jnp.concatenate([rot.reshape(n, 9), transl], axis=1)
    score = folding.evaluator_apply_folded(eva_folded, ctx, pose)
    out = Grasps(transl=transl, rot_matrix=rot, joint_conf=joints,
                 score=score, z=g.z)
    if exact:
        _, order = jax.lax.top_k(score, top_k)
    else:
        _, order = jax.lax.approx_max_k(score, top_k)
    return out.take(order), traj


@functools.partial(jax.jit, static_argnames=("n_samples", "top_k", "exact",
                                             "use_pallas"))
def object_to_grasps(gen_folded: dict, eva_folded: dict, basis: jax.Array,
                     points: jax.Array, key: jax.Array,
                     n_samples: int = 1000, top_k: int = 10,
                     z_offset: float = DEFAULT_Z_OFFSET,
                     exact: bool = False,
                     use_pallas: Optional[bool] = None) -> Grasps:
    """Cold-object serving: padded centered cloud → top-k scored grasps in
    ONE program — BPS encode + object-context folding + sample + score +
    top-k.  This is the per-new-object cost the offline app pays
    (reference ``dexgangrasp_offline.py:99``: encode elsewhere, 1000
    samples, filter); ``use_pallas`` selects the BPS kernel (Pallas TPU
    kernel vs blocked XLA — ops/bps.py)."""
    from dexgangrasp_tpu.ops.bps import bps_encode

    bps = bps_encode(basis, points, use_pallas=use_pallas)
    return sample_and_topk(gen_folded, eva_folded, bps, key, n_samples,
                           top_k, z_offset=z_offset, exact=exact)


@functools.partial(jax.jit, static_argnames=("n", "sort"))
def score_grasps(eva_folded: dict, bps: jax.Array, rot: jax.Array,
                 transl: jax.Array, n: int, sort: bool = False):
    """Score externally provided grasps (reference evaluate_grasps,
    dexgangrasp.py:367-391)."""
    pose = jnp.concatenate([rot.reshape(n, 9), transl], axis=1)
    ctx = folding.evaluator_object_context(eva_folded, bps)
    score = folding.evaluator_apply_folded(eva_folded, ctx, pose)
    if sort:
        order = jnp.argsort(-score)
        return score, order
    return score


@functools.partial(jax.jit, static_argnames=("n",))
def score_grasps_discriminator(disc_folded: dict, bps: jax.Array,
                               rot: jax.Array, transl: jax.Array,
                               joints: jax.Array, n: int):
    """Discriminator-as-scorer (reference filter_grasps_discriminator,
    dexgangrasp.py:444-493)."""
    pose = jnp.concatenate([rot.reshape(n, 9), transl, joints], axis=1)
    ctx = folding.discriminator_object_context(disc_folded, bps)
    return folding.discriminator_apply_folded(disc_folded, ctx, pose)


class GraspEngine:
    """High-level façade bundling basis + folded networks.

    Mirrors the reference ``DexGanGrasp`` wrapper inference API
    (generate_grasps / evaluate_grasps / filter_grasps,
    ``dexgangrasp.py:65-514``) on top of the fused program.
    """

    def __init__(self, gen_params, gen_state, eva_params, eva_state,
                 disc_params=None, disc_state=None,
                 basis: Optional[np.ndarray] = None,
                 z_offset: float = DEFAULT_Z_OFFSET,
                 cloud_pad: int = 8192, refine_steps: int = 0,
                 bf16: bool = False):
        self.gen_folded = folding.fold_generator(gen_params, gen_state)
        self.eva_folded = folding.fold_evaluator(eva_params, eva_state)
        if bf16:
            # bf16 serving mode: the sample/score path reads the folded
            # dtype and inserts its f32 islands (sample_and_score above);
            # the refine tail and the Pallas chain kernel keep f32
            # semantics, so filter/refine consumers fold/score in f32 via
            # eva_folded_f32.
            self.eva_folded_f32 = self.eva_folded
            self.gen_folded = folding.cast_folded(self.gen_folded,
                                                  jnp.bfloat16)
            self.eva_folded = folding.cast_folded(self.eva_folded,
                                                  jnp.bfloat16)
        else:
            self.eva_folded_f32 = self.eva_folded
        self.bf16 = bf16
        self.disc_folded = (
            folding.fold_discriminator(disc_params, disc_state)
            if disc_params is not None else None)
        self.encoder = BPSEncoder(basis=basis, cloud_pad=cloud_pad)
        self.z_offset = z_offset
        # >0: evaluator-gradient refinement + SO(3) projection + rescore
        # applied after sampling (the same composed-frontier tail the
        # diffusion engine serves — enables the VAE/GAN frontier recipes,
        # VERDICT r3 next-4)
        self.refine_steps = refine_steps
        self._key = jax.random.PRNGKey(0)

    @classmethod
    def from_checkpoints(cls, gen_path: Optional[str] = None,
                         eva_path: Optional[str] = None,
                         basis_path: Optional[str] = None, **kw
                         ) -> "GraspEngine":
        """Build an engine from checkpoint files.

        Accepts native .npz checkpoints (GAN runs or VAE runs — both expose
        gen_params/gen_state) and reference-format .pt files (legacy ffh*
        keys).  Missing paths fall back to fresh-initialized weights.
        """
        from dexgangrasp_tpu.models import torch_import
        from dexgangrasp_tpu.ops.bps import load_basis
        from dexgangrasp_tpu.train import checkpoints as ckpt

        dp = ds = None
        if gen_path and gen_path.endswith(".pt"):
            gp, gs, dp, ds, _ = torch_import.load_reference_gen_checkpoint(
                gen_path)
        elif gen_path:
            trees, _ = ckpt.load_pytrees(gen_path)
            if "gen_params" in trees:
                gp, gs = trees["gen_params"], trees["gen_state"]
            else:
                # raw VAE TrainState checkpoint (tools/vae_study.py saves
                # params/state whose 'decoder' subtree is generator-shaped)
                gp = trees["params"]["decoder"]
                gs = trees["state"]["decoder"]
            dp, ds = trees.get("disc_params"), trees.get("disc_state")
        else:
            from dexgangrasp_tpu.models.networks import init_dexgan

            (_, gp, gs), (_, dp, ds) = init_dexgan(jax.random.PRNGKey(0))
        if eva_path and eva_path.endswith(".pt"):
            ep, es, _ = torch_import.load_reference_eva_checkpoint(eva_path)
        elif eva_path:
            trees, _ = ckpt.load_pytrees(eva_path)
            ep, es = trees["params"], trees["state"]
        else:
            from dexgangrasp_tpu.models.networks import init_evaluator

            _, ep, es = init_evaluator(jax.random.PRNGKey(1))
        basis = load_basis(basis_path) if basis_path else None
        return cls(gp, gs, ep, es, disc_params=dp, disc_state=ds,
                   basis=basis, **kw)

    def _next_key(self, seed: Optional[int]) -> jax.Array:
        if seed is not None:
            return jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        return k

    def warmup(self, n_samples_list, top_k: int = 0) -> None:
        """Precompile the fused programs for the given sample counts so the
        first serving request pays no compile latency (first compiles can
        take tens of seconds on a cold cache)."""
        bps = jnp.zeros((4096,), jnp.float32)
        key = jax.random.PRNGKey(0)
        for n in n_samples_list:
            if top_k:
                out = sample_and_topk(self.gen_folded, self.eva_folded, bps,
                                      key, n, top_k, z_offset=self.z_offset)
            else:
                out = sample_and_score(self.gen_folded, self.eva_folded,
                                       bps, key, n, z_offset=self.z_offset)
            jax.block_until_ready(out.score)

    # ------------------------------------------------------------- encode

    def encode_pcd(self, points: np.ndarray) -> jax.Array:
        """Segmented, centered object cloud → (4096,) BPS encoding."""
        return jnp.asarray(self.encoder.encode(points))

    # ----------------------------------------------------------- generate

    def generate(self, bps, n_samples: int, seed: Optional[int] = None,
                 sample_uniform: bool = False,
                 z_offset: Optional[float] = None) -> Grasps:
        """Sample + score + sort n grasps for one object. Stays on device."""
        bps = jnp.asarray(bps, jnp.float32).reshape(-1)
        g = sample_and_score(
            self.gen_folded, self.eva_folded, bps, self._next_key(seed),
            n_samples,
            z_offset=self.z_offset if z_offset is None else z_offset,
            sample_uniform=sample_uniform)
        if self.refine_steps:
            g = self._refine(bps, g)
        return g

    def _refine(self, bps, g: Grasps) -> Grasps:
        """Fused evaluator-gradient refinement + SO(3) projection +
        rescore — the engine-level composed-frontier tail (reference runs
        refinement as a separate host loop, ``dexgangrasp.py:619-660``).
        Generator-agnostic (only needs eva_folded); the diffusion engine
        aliases this method."""
        from dexgangrasp_tpu.core.rotations import (
            ortho6d_from_rot_matrix,
            rot_matrix_from_ortho6d,
        )
        from dexgangrasp_tpu.engine.refine import refine_grasps_gradient

        # gradient ascent stays f32 even in bf16 serving mode (the VJP
        # walks the evaluator's landscape; bf16 gradients are too coarse)
        rot, transl, joints, _ = refine_grasps_gradient(
            self.eva_folded_f32, bps, g.rot_matrix, g.transl, g.joint_conf,
            num_steps=self.refine_steps)
        rot = rot_matrix_from_ortho6d(ortho6d_from_rot_matrix(rot))
        pose = jnp.concatenate([rot.reshape(rot.shape[0], 9), transl],
                               axis=1)
        ctx = folding.evaluator_object_context(self.eva_folded_f32, bps)
        score = folding.evaluator_apply_folded(self.eva_folded_f32, ctx,
                                               pose)
        return Grasps(transl=transl, rot_matrix=rot, joint_conf=joints,
                      score=score, z=g.z)

    def generate_topk(self, bps, n_samples: int, top_k: int,
                      seed: Optional[int] = None,
                      exact: bool = False) -> Grasps:
        """Serving path: sample n, return best top_k (approx by default)."""
        bps = jnp.asarray(bps, jnp.float32).reshape(-1)
        return sample_and_topk(self.gen_folded, self.eva_folded, bps,
                               self._next_key(seed), n_samples, top_k,
                               z_offset=self.z_offset, exact=exact)

    def generate_grasps(self, bps, n_samples: int, return_arr: bool = True,
                        z_offset: Optional[float] = None,
                        seed: Optional[int] = None):
        """Reference-compatible API (dexgangrasp.py:495): returns a dict
        with rot_matrix/transl/joint_conf (+score), unsorted semantics are
        irrelevant downstream since every consumer re-sorts."""
        g = self.generate(bps, n_samples, seed=seed, z_offset=z_offset)
        return g.to_dict(numpy=return_arr)

    # ----------------------------------------------------------- evaluate

    def evaluate_grasps(self, bps, grasps, return_arr: bool = True):
        """Score external grasps (reference dexgangrasp.py:367-391)."""
        g = grasps if isinstance(grasps, Grasps) else Grasps.from_dict(grasps)
        bps = jnp.asarray(bps, jnp.float32).reshape(-1)
        score = score_grasps(self.eva_folded_f32, bps,
                             jnp.asarray(g.rot_matrix, jnp.float32),
                             jnp.asarray(g.transl, jnp.float32), g.n)
        return np.asarray(score) if return_arr else score

    # ------------------------------------------------------------- filter

    def filter_grasps(self, bps, grasps, thresh: float = 0.5,
                      return_arr: bool = True, use_discriminator: bool = False):
        """Sort grasps by score desc, keep those above ``thresh``.

        Matches the reference contract (dexgangrasp.py:393-442): raises
        ValueError when even the best grasp scores below ``thresh``.
        The device program is static-shape (full sort); only the final
        thresh cut happens on host.
        """
        g = grasps if isinstance(grasps, Grasps) else Grasps.from_dict(grasps)
        bps_j = jnp.asarray(bps, jnp.float32).reshape(-1)
        rot = jnp.asarray(g.rot_matrix, jnp.float32)
        transl = jnp.asarray(g.transl, jnp.float32)
        if use_discriminator:
            if self.disc_folded is None:
                raise ValueError("engine built without discriminator params")
            score = score_grasps_discriminator(
                self.disc_folded, bps_j, rot, transl,
                jnp.asarray(g.joint_conf, jnp.float32), g.n)
        else:
            score = score_grasps(self.eva_folded_f32, bps_j, rot, transl,
                                 g.n)
        score = np.asarray(score)
        order = np.argsort(-score)
        sorted_score = score[order]
        if sorted_score[0] < thresh:
            raise ValueError(
                f"In total predicted {g.n} grasps, but best score "
                f"{sorted_score[0]:.4f} is still lower than thresh {thresh}")
        keep = order[sorted_score > thresh]
        out = g.take(jnp.asarray(keep))
        out = Grasps(transl=out.transl, rot_matrix=out.rot_matrix,
                     joint_conf=out.joint_conf,
                     score=jnp.asarray(score[keep]), z=out.z)
        return out.to_dict(numpy=True) if return_arr else out

    # --------------------------------------------------------- full fused

    def grasps_from_pcd(self, points: np.ndarray, n_samples: int,
                        thresh: float = 0.5, seed: Optional[int] = None):
        """Whole pipeline: raw centered cloud → filtered sorted grasps."""
        bps = self.encode_pcd(points)
        g = self.generate(bps, n_samples, seed=seed)
        return self.filter_grasps(bps, g, thresh=thresh, return_arr=False)
