"""Distilled one-step student tests (train/distill.py): the explicit-noise
teacher pairing, the student serving path, and the regression loop
actually cloning a teacher map."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.engine import folding
from dexgangrasp_tpu.engine.diffusion_pipeline import (
    DiffusionEngine,
    sample_and_score_student,
    sample_guided,
)
from dexgangrasp_tpu.models.diffusion import DexDiffuser
from dexgangrasp_tpu.models.networks import init_evaluator
from dexgangrasp_tpu.train.distill import (
    DistillTrainer,
    build_teacher_pairs,
    train_distill,
)

rng = np.random.default_rng(77)


@pytest.fixture(scope="module")
def tiny():
    """Small diffusion model + full evaluator folded (the folded evaluator
    is the object all serving paths share)."""
    model = DexDiffuser(n_blocks=1, hidden=64, cond_dim=32, t_dim=16)
    params = model.init(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    ef = folding.fold_evaluator(ep, es)
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    return model, params, ef, bps


def test_g_init_matches_internal_draw(tiny):
    """The distillation pairing assumption: passing the key's own normal
    draw as g_init reproduces the internal-draw trajectory exactly."""
    model, params, ef, bps = tiny
    key = jax.random.PRNGKey(3)
    n = 16
    a = sample_guided(model, params, ef, None, bps, key, n, steps=3,
                      guidance_scale=2.0)
    z = jax.random.normal(key, (n, model.g_dim), bps.dtype)
    b = sample_guided(model, params, ef, None, bps, key, n, steps=3,
                      guidance_scale=2.0, g_init=z)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # and a different start is a different endpoint
    c = sample_guided(model, params, ef, None, bps, key, n, steps=3,
                      guidance_scale=2.0, g_init=z + 0.1)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_student_pipeline_shapes_and_determinism(tiny):
    model, params, ef, bps = tiny
    g = sample_and_score_student(model, params, ef, None, bps,
                                 jax.random.PRNGKey(5), 32)
    assert g.transl.shape == (32, 3)
    assert g.rot_matrix.shape == (32, 3, 3)
    assert g.joint_conf.shape == (32, 12)
    assert g.score.shape == (32,)
    assert np.isfinite(np.asarray(g.z)).all()
    g2 = sample_and_score_student(model, params, ef, None, bps,
                                  jax.random.PRNGKey(5), 32)
    np.testing.assert_allclose(np.asarray(g.transl), np.asarray(g2.transl))
    # rotations are orthonormal (Gram-Schmidt path)
    rtr = np.einsum("nij,nkj->nik", np.asarray(g.rot_matrix),
                    np.asarray(g.rot_matrix))
    np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), rtr.shape),
                               atol=1e-5)


def test_distill_learns_teacher_map(tiny):
    """Regression on deterministic teacher pairs drives the student's MSE
    far below the target variance, on held-out noise draws too."""
    model, params, ef, _ = tiny
    views = rng.uniform(0, 0.2, (3, 4096)).astype(np.float32)
    pairs = build_teacher_pairs(model, params, ef, None, views,
                                jax.random.PRNGKey(0), pairs_per_view=96,
                                steps=3, guidance_scale=0.0)
    held = build_teacher_pairs(model, params, ef, None, views,
                               jax.random.PRNGKey(9), pairs_per_view=32,
                               steps=3, guidance_scale=0.0)
    trainer = DistillTrainer(model, lr=3e-4)
    ts = trainer.init_state(params)
    mse0 = float(trainer.eval_mse(
        ts.params, jnp.asarray(held["bps"]).repeat(32, 0),
        jnp.asarray(held["z"]).reshape(-1, model.g_dim),
        jnp.asarray(held["g"]).reshape(-1, model.g_dim)))
    ts, history = train_distill(trainer, ts, pairs, 400, batch_size=96,
                                eval_pairs=held, eval_every=100)
    assert len(history) == 4
    var = float(np.var(pairs["g"]))
    final = history[-1]
    assert final["train_mse"] < 0.25 * var
    assert final["eval_mse"] < 0.5 * var
    assert final["eval_mse"] < 0.5 * mse0


def test_student_engine_and_checkpoint_family(tmp_path, tiny):
    """family='distill' checkpoints auto-serve through the one-step path;
    the explicit model='student' CLI seam works; filter composes."""
    from dexgangrasp_tpu.cli import load_engine
    from dexgangrasp_tpu.train import checkpoints as ckpt

    model, params, ef, bps = tiny
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    path = str(tmp_path / "100_student_net.npz")
    ckpt.save_pytrees(path,
                      {"params": params, "step": jnp.asarray(100),
                       "normalizer_mean": jnp.zeros(21),
                       "normalizer_std": jnp.ones(21)},
                      {"family": "distill"})
    eva_path = str(tmp_path / "1_eva_net.npz")
    ckpt.save_pytrees(eva_path, {"params": ep, "state": es}, {})

    eng = DiffusionEngine.from_checkpoints(path, eva_path, model=model)
    assert eng.student is True
    out = eng.generate_grasps(np.asarray(bps), n_samples=8, seed=0)
    assert out["transl"].shape == (8, 3)

    # student serving == the raw pipeline fn modulo the identity normalizer
    raw = sample_and_score_student(model, params,
                                   folding.fold_evaluator(ep, es), None,
                                   bps, jax.random.PRNGKey(0), 8)
    np.testing.assert_allclose(out["transl"], np.asarray(raw.transl),
                               atol=1e-5)

    # CLI seam: model='student' dispatches to the one-step path (fresh
    # default-size weights — the ckpt above is tiny-architecture)
    eng2 = load_engine(None, eva_path, model="student", refine_steps=2)
    assert eng2.student is True and eng2.refine_steps == 2
    out2 = eng2.generate_grasps(np.asarray(bps), n_samples=8, seed=0)
    assert out2["transl"].shape == (8, 3)
    filt = eng2.filter_grasps(np.asarray(bps), out2, thresh=-1.0)
    assert filt["transl"].shape[0] == 8
