"""Diffusion grasp generator tests: shapes, training descends, sampling
recovers a known distribution, engine interop."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.core.rotations import rot_matrix_from_ortho6d
from dexgangrasp_tpu.models.diffusion import (
    DexDiffuser,
    GraspNormalizer,
    cosine_alpha_bar,
    grasp_vector,
    split_grasp_vector,
    timestep_embedding,
)
from dexgangrasp_tpu.train.diffusion import DiffusionTrainer

rng = np.random.default_rng(121)


def test_schedule_and_embedding():
    t = jnp.linspace(0, 1, 11)
    ab = np.asarray(cosine_alpha_bar(t))
    assert ab[0] > 0.999 and ab[-1] < 1e-3
    assert (np.diff(ab) < 0).all()  # monotone decreasing
    emb = timestep_embedding(t, 64)
    assert emb.shape == (11, 64)
    assert not np.allclose(np.asarray(emb[0]), np.asarray(emb[5]))


def test_denoiser_shapes_and_conditioning():
    model = DexDiffuser()
    params = model.init(jax.random.PRNGKey(0))
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    cond = model.embed_object(params, bps)
    assert cond.shape == (256,)
    g = jnp.asarray(rng.normal(size=(32, 21)).astype(np.float32))
    t = jnp.full((32,), 0.5)
    e = model.eps(params, cond, g, t)
    assert e.shape == (32, 21)
    # conditioning matters
    bps2 = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    e2 = model.eps(params, model.embed_object(params, bps2), g, t)
    assert not np.allclose(np.asarray(e), np.asarray(e2))


def test_training_descends_and_sampling_recovers_mode():
    """Train on a single tight grasp mode; DDIM samples must converge
    near it."""
    model = DexDiffuser(n_blocks=2, hidden=256, cond_dim=64)
    trainer = DiffusionTrainer(model, lr=2e-3)
    ts = trainer.init_state(jax.random.PRNGKey(0))
    bps = jnp.asarray(rng.uniform(0, 0.2, (64, 4096)).astype(np.float32))
    # one fixed mode in normalized space + small noise
    mode = jnp.asarray(rng.normal(size=(21,)).astype(np.float32))
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(400):
        key, k1, k2 = jax.random.split(key, 3)
        g0 = mode + 0.05 * jax.random.normal(k1, (64, 21))
        ts, loss = trainer.train_step(ts, bps, g0, k2)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.7
    samples = model.sample(ts.params, bps[0], jax.random.PRNGKey(2), 128,
                           steps=30)
    err = np.linalg.norm(np.asarray(samples) - np.asarray(mode), axis=1)
    # samples concentrate near the mode (21-dim; samples from the N(0,I)
    # prior would sit at ||x - mode|| ≈ sqrt(21 + ||mode||²))
    prior_dist = np.sqrt(21 + float(jnp.sum(mode ** 2)))
    assert np.median(err) < prior_dist * 0.45


def test_cfg_training_and_sampling():
    """cfg_dropout loss descends; sample_cfg(w=1) reduces exactly to the
    plain conditional sampler; w≠1 changes the output."""
    model = DexDiffuser(n_blocks=2, hidden=128, cond_dim=64)
    tr = DiffusionTrainer(model, lr=2e-3, cfg_dropout=0.15)
    ts = tr.init_state(jax.random.PRNGKey(0))
    bps = jnp.asarray(rng.uniform(0, 0.2, (32, 4096)).astype(np.float32))
    mode = jnp.asarray(rng.normal(size=(21,)).astype(np.float32))
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(150):
        key, k1, k2 = jax.random.split(key, 3)
        g0 = mode + 0.05 * jax.random.normal(k1, (32, 21))
        ts, loss = tr.train_step(ts, bps, g0, k2)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.8

    k = jax.random.PRNGKey(7)
    plain = model.sample(ts.params, bps[0], k, 32, steps=8)
    w1 = model.sample_cfg(ts.params, bps[0], k, 32, steps=8, w=1.0)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(plain), atol=1e-5)
    w3 = model.sample_cfg(ts.params, bps[0], k, 32, steps=8, w=3.0)
    assert float(jnp.max(jnp.abs(w3 - plain))) > 1e-3


def test_bf16_mixed_precision_training():
    """compute_dtype=bfloat16: master params/updates stay f32, the loss
    still descends, and the loss value tracks the f32 loss closely."""
    model = DexDiffuser(n_blocks=2, hidden=128, cond_dim=64)
    tr16 = DiffusionTrainer(model, lr=2e-3, compute_dtype=jnp.bfloat16)
    ts = tr16.init_state(jax.random.PRNGKey(0))
    bps = jnp.asarray(rng.uniform(0, 0.2, (32, 4096)).astype(np.float32))
    mode = jnp.asarray(rng.normal(size=(21,)).astype(np.float32))
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(150):
        key, k1, k2 = jax.random.split(key, 3)
        g0 = mode + 0.05 * jax.random.normal(k1, (32, 21))
        ts, loss = tr16.train_step(ts, bps, g0, k2)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.8
    assert all(a.dtype == jnp.float32 for a in jax.tree.leaves(ts.params))
    # bf16 and f32 loss agree at the same params/key (forward-precision gap)
    l32 = float(model.loss(ts.params, jax.random.PRNGKey(9), bps,
                           mode + jnp.zeros((32, 21))))
    l16 = float(model.loss(ts.params, jax.random.PRNGKey(9), bps,
                           mode + jnp.zeros((32, 21)),
                           compute_dtype=jnp.bfloat16))
    assert abs(l16 - l32) < 0.05 * max(l32, 0.1)


def test_grasp_vector_roundtrip_and_normalizer():
    rot6 = jnp.asarray(rng.normal(size=(16, 6)).astype(np.float32))
    transl = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    joints = jnp.asarray(rng.uniform(size=(16, 12)).astype(np.float32))
    g = grasp_vector(rot6, transl, joints)
    r2, t2, j2 = split_grasp_vector(g)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(rot6), atol=0)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(transl), atol=0)
    norm = GraspNormalizer.fit(g)
    gn = norm.normalize(g)
    np.testing.assert_allclose(np.asarray(gn.mean(axis=0)), 0.0, atol=1e-6)
    back = norm.denormalize(gn)
    np.testing.assert_allclose(np.asarray(back), np.asarray(g), atol=1e-6)


_GUIDANCE_CACHE = {}


def _tiny_guidance_setup():
    """Untrained tiny diffuser + an evaluator briefly trained on a
    separable toy objective (success ⇔ transl_x > 0): a randomly
    initialized evaluator (xavier gain 0.02) is a near-constant field with
    ~1e-5 gradients, so guidance tests need a real score landscape."""
    if _GUIDANCE_CACHE:
        return _GUIDANCE_CACHE["v"]
    from scipy.spatial.transform import Rotation

    from dexgangrasp_tpu.engine import folding
    from dexgangrasp_tpu.train.gan import GanTrainer, TrainConfig

    lrng = np.random.default_rng(2121)  # local: order-independent setup
    model = DexDiffuser(n_blocks=2, hidden=128, cond_dim=64)
    params = model.init(jax.random.PRNGKey(7))
    bps = jnp.asarray(lrng.uniform(0, 0.2, 4096).astype(np.float32))
    trainer = GanTrainer(TrainConfig(lr=1e-3))
    ts = trainer.init_evaluator_state(jax.random.PRNGKey(8))
    transl = lrng.normal(size=(64, 3)).astype(np.float32)
    batch = {
        "bps_object": jnp.broadcast_to(bps, (64, 4096)),
        "rot_matrix": jnp.asarray(
            Rotation.random(64, rng=lrng).as_matrix().astype(np.float32)),
        "transl": jnp.asarray(transl),
        "joint_conf": jnp.asarray(
            lrng.uniform(0, 1, size=(64, 12)).astype(np.float32)),
        "label": jnp.asarray((transl[:, 0] > 0).astype(np.float32)),
    }
    for i in range(40):
        ts, _ = trainer.evaluator_step(ts, batch, jax.random.PRNGKey(i))
    ef = folding.fold_evaluator(ts.params, ts.state)
    _GUIDANCE_CACHE["v"] = (model, params, ef, bps, ts.params, ts.state)
    return _GUIDANCE_CACHE["v"]


def test_guided_sampling_scale_zero_matches_plain_ddim():
    """guidance_scale=0 re-derives an algebraically identical ε, so the
    guided sampler must reproduce plain DDIM trajectories."""
    from dexgangrasp_tpu.engine.diffusion_pipeline import sample_guided

    model, params, ef, bps, _, _ = _tiny_guidance_setup()
    key = jax.random.PRNGKey(9)
    plain = model.sample(params, bps, key, 32, steps=12)
    guided = sample_guided(model, params, ef, None, bps, key, 32,
                           steps=12, guidance_scale=0.0)
    np.testing.assert_allclose(np.asarray(guided), np.asarray(plain),
                               atol=2e-4)


def test_guided_sampling_raises_evaluator_score():
    """Classifier guidance must increase the mean evaluator success score
    vs the unguided sampler at the same PRNG key."""
    from dexgangrasp_tpu.engine.diffusion_pipeline import (
        sample_and_score_diffusion,
        sample_and_score_guided,
    )

    model, params, ef, bps, _, _ = _tiny_guidance_setup()
    key = jax.random.PRNGKey(10)
    # normalizer keeps denormalized poses in the evaluator's sensitive
    # range (untrained-DDIM outputs are large; saturation kills gradients)
    norm = GraspNormalizer(mean=jnp.zeros(21), std=0.01 * jnp.ones(21))
    base = sample_and_score_diffusion(model, params, ef, norm, bps, key,
                                      128, steps=12)
    guided = sample_and_score_guided(model, params, ef, norm, bps, key,
                                     128, steps=12, guidance_scale=3.0)
    assert np.isfinite(np.asarray(guided.score)).all()
    assert float(jnp.mean(guided.score)) > float(jnp.mean(base.score))


def test_engine_guidance_scale_plumbing():
    """DiffusionEngine(guidance_scale=...) routes generate() through the
    guided sampler; per-call override wins.

    The untrained diffuser's DDIM output is large-magnitude; without a
    normalizer the evaluator saturates and its gradient vanishes (a no-op
    guidance that made this test order-dependent).  The normalizer keeps
    denormalized poses in the evaluator's sensitive range."""
    from dexgangrasp_tpu.engine.diffusion_pipeline import DiffusionEngine

    model, params, _, _, ep, es = _tiny_guidance_setup()
    norm = GraspNormalizer(mean=jnp.zeros(21), std=0.01 * jnp.ones(21))
    eng = DiffusionEngine(params, ep, es, model=model, normalizer=norm,
                          ddim_steps=8, guidance_scale=5.0)
    bps = np.random.default_rng(5).uniform(0, 0.2, 4096).astype(np.float32)
    g_on = eng.generate_grasps(bps, n_samples=16, seed=3)
    g_off = eng.generate_grasps(bps, n_samples=16, seed=3,
                                guidance_scale=0.0)
    assert g_on["transl"].shape == (16, 3)
    assert float(np.max(np.abs(g_on["transl"] - g_off["transl"]))) > 1e-4
    # guided run must raise the mean evaluator score
    assert float(np.mean(g_on["score"])) > float(np.mean(g_off["score"]))


def test_sample_refine_rescore_diffusion():
    """The fused diffusion serving chain: refinement must raise the mean
    evaluator success trajectory; output is top-k shaped and SO(3)."""
    from dexgangrasp_tpu.engine.diffusion_pipeline import (
        sample_refine_rescore_diffusion,
    )

    model, params, ef, bps, _, _ = _tiny_guidance_setup()
    norm = GraspNormalizer(mean=jnp.zeros(21), std=0.01 * jnp.ones(21))
    out, traj = sample_refine_rescore_diffusion(
        model, params, ef, norm, bps, jax.random.PRNGKey(13), 64, 8,
        steps=6, refine_steps=5, exact=True)
    assert out.transl.shape == (8, 3)
    assert traj.shape == (6, 64)
    assert float(jnp.mean(traj[-1])) > float(jnp.mean(traj[0]))
    eye = np.einsum("bij,bkj->bik", np.asarray(out.rot_matrix),
                    np.asarray(out.rot_matrix))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-4)
    # guided variant compiles + runs
    out2, _ = sample_refine_rescore_diffusion(
        model, params, ef, norm, bps, jax.random.PRNGKey(13), 32, 4,
        steps=6, refine_steps=3, guidance_scale=2.0, exact=True)
    assert out2.transl.shape == (4, 3)


def test_multi_object_diffusion_topk():
    """(O, 4096) bps → (O, top_k) grasps in one program; per-object rows
    must match the single-object sampler at the same per-object key."""
    from dexgangrasp_tpu.engine.diffusion_pipeline import (
        sample_and_topk_diffusion,
        sample_and_topk_multi_diffusion,
    )

    model, params, ef, bps, _, _ = _tiny_guidance_setup()
    bps_batch = jnp.stack([bps, bps * 0.5])
    key = jax.random.PRNGKey(21)
    out = sample_and_topk_multi_diffusion(model, params, ef, None,
                                          bps_batch, key, 64, 8, steps=6,
                                          exact=True)
    assert out.transl.shape == (2, 8, 3)
    assert out.score.shape == (2, 8)
    keys = jax.random.split(key, 2)
    single = sample_and_topk_diffusion(model, params, ef, None, bps_batch[1],
                                       keys[1], 64, 8, steps=6, exact=True)
    np.testing.assert_allclose(np.asarray(out.score[1]),
                               np.asarray(single.score), atol=1e-5)
    # guided variant compiles and runs
    g = sample_and_topk_multi_diffusion(model, params, ef, None, bps_batch,
                                        key, 32, 4, steps=6,
                                        guidance_scale=2.0, exact=True)
    assert g.transl.shape == (2, 4, 3)


def test_sampled_grasps_flow_into_engine_scoring():
    """Diffusion samples → rot6d→matrix → evaluator scoring path."""
    from dexgangrasp_tpu.engine import folding
    from dexgangrasp_tpu.engine.pipeline import score_grasps
    from dexgangrasp_tpu.models.networks import init_evaluator

    model = DexDiffuser(n_blocks=2, hidden=128, cond_dim=64)
    params = model.init(jax.random.PRNGKey(3))
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    g = model.sample(params, bps, jax.random.PRNGKey(4), 32, steps=10)
    rot6, transl, joints = split_grasp_vector(g)
    R = rot_matrix_from_ortho6d(rot6)
    eye = np.einsum("bij,bkj->bik", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-4)
    _, ep, es = init_evaluator(jax.random.PRNGKey(5))
    ef = folding.fold_evaluator(ep, es)
    scores = score_grasps(ef, bps, R, transl, 32)
    assert scores.shape == (32,)
    assert np.isfinite(np.asarray(scores)).all()
