"""Network parity tests: our JAX models vs the torch oracle after weight
transfer, in eval and train modes, plus param-count checks vs SURVEY §2."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.models import (
    DexDiscriminator,
    DexEvaluator,
    DexGenerator,
)
from dexgangrasp_tpu.models.networks import init_dexgan, init_evaluator, param_count
from dexgangrasp_tpu.models.torch_import import (
    dexgan_to_torch_sd,
    discriminator_from_torch_sd,
    evaluator_from_torch_sd,
    evaluator_to_torch_sd,
    generator_from_torch_sd,
)

from torch_oracle import TorchDiscriminator, TorchEvaluator, TorchGenerator

rng = np.random.default_rng(7)
B = 16


def _rand_inputs():
    bps = rng.uniform(0, 0.2, size=(B, 4096)).astype(np.float32)
    rot = rng.normal(size=(B, 9)).astype(np.float32)
    transl = rng.normal(size=(B, 3)).astype(np.float32) * 0.1
    joints = rng.uniform(0, 1, size=(B, 12)).astype(np.float32)
    z = rng.normal(size=(B, 5)).astype(np.float32)
    return bps, rot, transl, joints, z


@pytest.fixture(scope="module")
def torch_nets():
    torch.manual_seed(0)
    g = TorchGenerator().eval()
    d = TorchDiscriminator().eval()
    e = TorchEvaluator().eval()
    # randomize BN running stats so eval-mode parity is non-trivial
    for net in (g, d, e):
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    return g, d, e


def test_generator_parity_eval(torch_nets):
    g, _, _ = torch_nets
    bps, _, _, _, z = _rand_inputs()
    # torch_oracle keys have no 'generator.' prefix
    params, state = generator_from_torch_sd(g.state_dict(), prefix="")
    gen = DexGenerator()
    out, _ = gen.apply(params, state, jnp.asarray(z), jnp.asarray(bps),
                       train=False)
    with torch.no_grad():
        rot_t, transl_t, joints_t = g(torch.from_numpy(z), torch.from_numpy(bps))
    np.testing.assert_allclose(np.asarray(out.rot_6d), rot_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.transl), transl_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.joint_conf), joints_t.numpy(), atol=1e-4)


def test_discriminator_parity_eval(torch_nets):
    _, d, _ = torch_nets
    bps, rot, transl, joints, _ = _rand_inputs()
    params, state = discriminator_from_torch_sd(d.state_dict(), prefix="")
    disc = DexDiscriminator()
    score, _ = disc.apply(params, state, jnp.asarray(bps), jnp.asarray(rot),
                          jnp.asarray(transl), jnp.asarray(joints), train=False)
    with torch.no_grad():
        ref = d(torch.from_numpy(bps), torch.from_numpy(rot),
                torch.from_numpy(transl), torch.from_numpy(joints))
    np.testing.assert_allclose(np.asarray(score), ref.numpy(), atol=1e-5)


def test_evaluator_parity_eval(torch_nets):
    _, _, e = torch_nets
    bps, rot, transl, _, _ = _rand_inputs()
    params, state = evaluator_from_torch_sd(e.state_dict(), prefix="")
    eva = DexEvaluator()
    p, _ = eva.apply(params, state, jnp.asarray(bps), jnp.asarray(rot),
                     jnp.asarray(transl), train=False)
    with torch.no_grad():
        ref = e(torch.from_numpy(bps), torch.from_numpy(rot),
                torch.from_numpy(transl))
    np.testing.assert_allclose(np.asarray(p), ref.numpy(), atol=1e-5)


def test_generator_parity_train_mode_bn(torch_nets):
    """Train-mode forward must use batch stats and update running stats the
    torch way (momentum 0.1, unbiased running var)."""
    g, _, _ = torch_nets
    bps, _, _, _, z = _rand_inputs()
    params, state = generator_from_torch_sd(g.state_dict(), prefix="")
    gen = DexGenerator()
    out, new_state = gen.apply(params, state, jnp.asarray(z), jnp.asarray(bps),
                               train=True)
    g_train = TorchGenerator()
    g_train.load_state_dict(g.state_dict())
    g_train.train()
    rot_t, transl_t, joints_t = g_train(torch.from_numpy(z), torch.from_numpy(bps))
    np.testing.assert_allclose(np.asarray(out.rot_6d),
                               rot_t.detach().numpy(), atol=1e-4)
    # running stats after one train step
    np.testing.assert_allclose(
        np.asarray(new_state["bn0"]["mean"]),
        g_train.gen_bn1.running_mean.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state["bn0"]["var"]),
        g_train.gen_bn1.running_var.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state["rb2"]["bn2"]["mean"]),
        g_train.gen_rb2.bn2.running_mean.detach().numpy(), atol=1e-5)


def test_roundtrip_export(torch_nets):
    g, d, e = torch_nets
    gp, gs = generator_from_torch_sd(g.state_dict(), prefix="")
    dp, ds = discriminator_from_torch_sd(d.state_dict(), prefix="")
    sd = dexgan_to_torch_sd(gp, gs, dp, ds)
    for k, v in sd.items():
        if "num_batches" in k:
            continue
        short = k.replace("generator.", "").replace("discriminator.", "")
        np.testing.assert_allclose(v.numpy(),
                                   {**g.state_dict(), **d.state_dict()}[short].numpy(),
                                   atol=0)
    ep, es = evaluator_from_torch_sd(e.state_dict(), prefix="")
    sd_e = evaluator_to_torch_sd(ep, es)
    for k, v in sd_e.items():
        if "num_batches" in k:
            continue
        np.testing.assert_allclose(v.numpy(), e.state_dict()[k].numpy(), atol=0)


def test_param_counts_match_survey():
    """SURVEY §2.1: Generator ≈ 7.0M, Discriminator ≈ 7.0M, Evaluator ≈ 10.7M."""
    (gen, gp, gs), (disc, dp, ds) = init_dexgan(jax.random.PRNGKey(0))
    eva, ep, es = init_evaluator(jax.random.PRNGKey(1))
    n_gen, n_disc, n_eva = param_count(gp), param_count(dp), param_count(ep)
    # torch counts include BN affine; ours exclude running stats, same as torch
    t_gen = sum(p.numel() for p in TorchGenerator().parameters())
    t_disc = sum(p.numel() for p in TorchDiscriminator().parameters())
    t_eva = sum(p.numel() for p in TorchEvaluator().parameters())
    assert n_gen == t_gen
    assert n_disc == t_disc
    assert n_eva == t_eva
    assert abs(n_gen + n_disc - 14e6) < 1.5e6
    assert abs(n_eva - 10.7e6) < 1.0e6


def test_init_statistics():
    """Xavier-normal gain 0.02 (dexgangrasp.py:50) and BN N(1, 0.02)."""
    (gen, gp, gs), _ = init_dexgan(jax.random.PRNGKey(42))
    w = np.asarray(gp["rb1"]["fc1"]["w"])
    fan_in, fan_out = w.shape
    expected_std = 0.02 * np.sqrt(2.0 / (fan_in + fan_out))
    assert abs(w.std() / expected_std - 1.0) < 0.05
    bn_scale = np.asarray(gp["bn0"]["scale"])
    assert abs(bn_scale.mean() - 1.0) < 0.01
    assert abs(bn_scale.std() - 0.02) < 0.005


def test_dropout_active_in_train_mode():
    eva, ep, es = init_evaluator(jax.random.PRNGKey(3))
    bps, rot, transl, _, _ = _rand_inputs()
    args = (jnp.asarray(bps), jnp.asarray(rot), jnp.asarray(transl))
    p1, _ = eva.apply(ep, es, *args, train=True,
                      dropout_key=jax.random.PRNGKey(0))
    p2, _ = eva.apply(ep, es, *args, train=True,
                      dropout_key=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(p1), np.asarray(p2))
    # eval mode: deterministic
    p3, _ = eva.apply(ep, es, *args, train=False)
    p4, _ = eva.apply(ep, es, *args, train=False)
    np.testing.assert_allclose(np.asarray(p3), np.asarray(p4), atol=0)
