"""cVAE generator family tests: shapes, training descends (recon + KL),
decoder slots into the standard folded engine."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.engine import folding
from dexgangrasp_tpu.engine.pipeline import sample_and_topk
from dexgangrasp_tpu.models.networks import init_evaluator
from dexgangrasp_tpu.models.vae import DexVAE
from dexgangrasp_tpu.train.vae import VaeTrainer

rng = np.random.default_rng(141)


def _batch(n=16):
    from scipy.spatial.transform import Rotation
    return {
        "bps_object": jnp.asarray(
            rng.uniform(0, 0.2, (n, 4096)).astype(np.float32)),
        "rot_matrix": jnp.asarray(
            Rotation.random(n, rng=rng).as_matrix().astype(np.float32)),
        "transl": jnp.asarray((rng.normal(size=(n, 3)) * 0.1).astype(np.float32)),
        "joint_conf": jnp.asarray(
            rng.uniform(0, 1, (n, 12)).astype(np.float32)),
    }


def test_vae_forward_shapes():
    model = DexVAE()
    params, state = model.init(jax.random.PRNGKey(0))
    b = _batch(8)
    from dexgangrasp_tpu.core.rotations import ortho6d_from_rot_matrix

    gv = jnp.concatenate([ortho6d_from_rot_matrix(b["rot_matrix"]),
                          b["transl"], b["joint_conf"]], axis=1)
    out, mu, logvar, st = model.forward(params, state, jax.random.PRNGKey(1),
                                        gv, b["bps_object"])
    assert out.rot_6d.shape == (8, 6)
    assert out.transl.shape == (8, 3)
    assert out.joint_conf.shape == (8, 12)
    assert mu.shape == (8, 5) and logvar.shape == (8, 5)


def test_vae_training_descends():
    trainer = VaeTrainer(lr=1e-3)
    ts = trainer.init_state(jax.random.PRNGKey(0))
    batch = _batch(32)
    first = None
    for i in range(12):
        ts, logs = trainer.train_step(ts, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(logs["total_loss_vae"])
    assert float(logs["total_loss_vae"]) < first
    assert np.isfinite(float(logs["kl_loss"]))
    assert int(ts.step) == 12


def test_vae_decoder_feeds_standard_engine():
    """The decoder folds like DexGenerator and runs the fused top-k path."""
    model = DexVAE()
    params, state = model.init(jax.random.PRNGKey(2))
    gen_folded = folding.fold_generator(params["decoder"], state["decoder"])
    _, ep, es = init_evaluator(jax.random.PRNGKey(3))
    eva_folded = folding.fold_evaluator(ep, es)
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    g = sample_and_topk(gen_folded, eva_folded, bps, jax.random.PRNGKey(4),
                        128, 8, exact=True)
    assert g.transl.shape == (8, 3)
    assert (np.diff(np.asarray(g.score)) <= 1e-7).all()
    # folded decode == unfolded decode on the same z
    z = jnp.asarray(rng.normal(size=(16, 5)).astype(np.float32))
    ctx = folding.generator_object_context(gen_folded, bps)
    r6_f, t_f, j_f = folding.generator_apply_folded(gen_folded, ctx, z)
    out, _ = model.decode(params, state, z,
                          jnp.tile(bps[None], (16, 1)), train=False)
    np.testing.assert_allclose(np.asarray(r6_f), np.asarray(out.rot_6d),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(t_f), np.asarray(out.transl),
                               atol=2e-5)


def test_diffusion_pipeline_topk():
    from dexgangrasp_tpu.engine.diffusion_pipeline import (
        sample_and_topk_diffusion,
    )
    from dexgangrasp_tpu.models.diffusion import DexDiffuser

    model = DexDiffuser(n_blocks=2, hidden=128, cond_dim=64)
    dparams = model.init(jax.random.PRNGKey(5))
    _, ep, es = init_evaluator(jax.random.PRNGKey(6))
    eva_folded = folding.fold_evaluator(ep, es)
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    g = sample_and_topk_diffusion(model, dparams, eva_folded, None, bps,
                                  jax.random.PRNGKey(7), 64, 8, steps=10,
                                  exact=True)
    assert g.transl.shape == (8, 3)
    R = np.asarray(g.rot_matrix)
    np.testing.assert_allclose(np.einsum("bij,bkj->bik", R, R),
                               np.broadcast_to(np.eye(3), R.shape), atol=1e-4)
    assert (np.diff(np.asarray(g.score)) <= 1e-7).all()
