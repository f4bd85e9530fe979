"""Gold-standard training parity: one full BCE-GAN update (D step + G step,
Adam with L2 weight decay, train-mode BN) executed by a torch oracle
replicating the reference's update_dexgangrasp (dexgangrasp.py:757-823)
and by our jitted gan_step, from identical weights / batch / latents —
updated parameters must match.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.models.torch_import import (
    discriminator_from_torch_sd,
    generator_from_torch_sd,
)
from dexgangrasp_tpu.train.gan import GanTrainer, GanTrainState, TrainConfig

from torch_oracle import TorchDiscriminator, TorchGenerator

rng = np.random.default_rng(131)

# under full-suite CPU saturation, multi-threaded torch reductions can
# reorder BN batch-stat sums enough to flake the tight parity bounds
torch.set_num_threads(1)

LR = 1e-4
WD = 5e-4
B = 16


def torch_rot_from_ortho6d(o6):
    x_raw, y_raw = o6[:, 0:3], o6[:, 3:6]

    def norm(v):
        mag = torch.sqrt(v.pow(2).sum(1))
        return v / torch.max(mag, torch.tensor([1e-8])).view(-1, 1)

    x = norm(x_raw)
    z = norm(torch.cross(x, y_raw, dim=1))
    y = torch.cross(z, x, dim=1)
    return torch.cat([x.view(-1, 3, 1), y.view(-1, 3, 1), z.view(-1, 3, 1)], 2)


def torch_gan_step(gen, disc, opt_g, opt_d, batch, z):
    """Reference update_dexgangrasp semantics in torch."""
    gen.train()
    disc.train()
    bce = torch.nn.BCELoss()
    mse = torch.nn.MSELoss()
    bps = torch.from_numpy(batch["bps_object"])
    real_rot_flat = torch.from_numpy(batch["rot_matrix"].reshape(B, 9))
    real_transl = torch.from_numpy(batch["transl"])
    real_joints = torch.from_numpy(batch["joint_conf"])

    rot6, transl, joints = gen(torch.from_numpy(z), bps)
    rot_flat = torch_rot_from_ortho6d(rot6).reshape(B, 9)

    # D step: real then fake-detached (BN updated in that order)
    real_score = disc(bps, real_rot_flat, real_transl, real_joints)
    fake_score = disc(bps, rot_flat.detach(), transl.detach(),
                      joints.detach())
    loss_d = (bce(real_score, torch.ones_like(real_score))
              + bce(fake_score, torch.zeros_like(fake_score))) / 2
    opt_d.zero_grad()
    loss_d.backward(retain_graph=True)
    opt_d.step()

    # G step: the reference REUSES the single generator forward
    # (update_dexgangrasp builds fake_data from y_fake, dexgangrasp.py:
    # 797-807) — generator BN running stats update exactly once per step
    fake_score_g = disc(bps, rot_flat, transl, joints)
    adv = bce(fake_score_g, torch.ones_like(fake_score_g))
    transl_l2 = mse(transl, real_transl)
    rot_l2 = mse(rot_flat, real_rot_flat)
    conf_l2 = mse(joints, real_joints)
    loss_g = adv + 100.0 * transl_l2 + 1.0 * rot_l2 + 10.0 * conf_l2
    opt_g.zero_grad()
    loss_g.backward()
    opt_g.step()
    return float(loss_d), float(loss_g)


@pytest.mark.slow
def test_one_gan_step_matches_torch():
    from scipy.spatial.transform import Rotation

    torch.manual_seed(3)
    gen_t = TorchGenerator()
    disc_t = TorchDiscriminator()
    opt_g = torch.optim.Adam(gen_t.parameters(), lr=LR, betas=(0.9, 0.999),
                             weight_decay=WD)
    opt_d = torch.optim.Adam(disc_t.parameters(), lr=LR, betas=(0.9, 0.999),
                             weight_decay=WD)

    batch_np = {
        "bps_object": rng.uniform(0, 0.2, (B, 4096)).astype(np.float32),
        "rot_matrix": Rotation.random(B, rng=rng).as_matrix().astype(np.float32),
        "transl": (rng.normal(size=(B, 3)) * 0.1).astype(np.float32),
        "joint_conf": rng.uniform(0, 1, (B, 12)).astype(np.float32),
    }
    z = rng.normal(size=(B, 5)).astype(np.float32)

    # import identical weights into our stack
    gp, gs = generator_from_torch_sd(gen_t.state_dict(), prefix="")
    dp, ds = discriminator_from_torch_sd(disc_t.state_dict(), prefix="")
    trainer = GanTrainer(TrainConfig(lr_gen=LR, lr_dis=LR, weight_decay=WD))
    ts = GanTrainState(
        gen_params=jax.tree.map(jnp.asarray, gp),
        gen_state=jax.tree.map(jnp.asarray, gs),
        disc_params=jax.tree.map(jnp.asarray, dp),
        disc_state=jax.tree.map(jnp.asarray, ds),
        gen_opt=trainer.gen_tx.init(gp), disc_opt=trainer.disc_tx.init(dp),
        step=jnp.zeros((), jnp.int32))

    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}
    jb["z"] = jnp.asarray(z)
    ts2, logs = trainer.gan_step(ts, jb, jax.random.PRNGKey(0))

    loss_d_t, loss_g_t = torch_gan_step(gen_t, disc_t, opt_g, opt_d,
                                        batch_np, z)

    # losses agree
    np.testing.assert_allclose(float(logs["total_loss_disc"]), loss_d_t,
                               rtol=2e-4)
    np.testing.assert_allclose(float(logs["total_loss_gen"]), loss_g_t,
                               rtol=2e-4)

    # updated parameters agree (spot-check every layer family)
    gp2, _ = generator_from_torch_sd(gen_t.state_dict(), prefix="")
    dp2, _ = discriminator_from_torch_sd(disc_t.state_dict(), prefix="")

    def check(ours, theirs, path=""):
        """f32 summation-order differences between torch and XLA get
        amplified by Adam's 1/sqrt(v) for near-zero-gradient entries, so a
        handful of elements can drift a few 1e-4; require the bulk exact
        and the tail bounded."""
        o = np.asarray(ours)
        t = np.asarray(theirs)
        diff = np.abs(o - t)
        frac_tight = (diff <= 5e-6).mean()
        assert frac_tight > 0.9999, \
            f"{path}: only {frac_tight:.6f} of elements within 5e-6"
        assert diff.max() < 1e-3, \
            f"{path}: max diff {diff.max():.2e}"

    for name in ("rb1", "rb2"):
        check(ts2.gen_params[name]["fc1"]["w"], gp2[name]["fc1"]["w"],
              f"gen.{name}.fc1.w")
        check(ts2.gen_params[name]["bn1"]["scale"], gp2[name]["bn1"]["scale"],
              f"gen.{name}.bn1.scale")
        check(ts2.disc_params[name]["fc2"]["w"], dp2[name]["fc2"]["w"],
              f"disc.{name}.fc2.w")
    check(ts2.gen_params["rot"]["w"], gp2["rot"]["w"], "gen.rot.w")
    check(ts2.gen_params["transl"]["b"], gp2["transl"]["b"], "gen.transl.b")
    check(ts2.gen_params["bn0"]["scale"], gp2["bn0"]["scale"], "gen.bn0.scale")
    check(ts2.disc_params["out"]["w"], dp2["out"]["w"], "disc.out.w")

    # BN running stats after the step agree too.  bn0 consumes the raw bps
    # batch, so its expected post-step running mean is analytic:
    # 0.9·init + 0.1·batch_mean — compare BOTH sides against it so a rare
    # in-suite flake identifies which side deviated.
    gs2_t = generator_from_torch_sd(gen_t.state_dict(), prefix="")[1]
    init_mean = np.asarray(ts.gen_state["bn0"]["mean"])
    analytic = 0.9 * init_mean + 0.1 * batch_np["bps_object"].mean(axis=0)
    ours_dev = np.abs(np.asarray(ts2.gen_state["bn0"]["mean"]) - analytic).max()
    theirs_dev = np.abs(np.asarray(gs2_t["bn0"]["mean"]) - analytic).max()
    assert ours_dev < 1e-5, f"OUR bn0.mean deviates analytically: {ours_dev}"
    assert theirs_dev < 1e-5, \
        f"TORCH-ORACLE bn0.mean deviates analytically: {theirs_dev}"
    check(ts2.gen_state["bn0"]["mean"], gs2_t["bn0"]["mean"], "gen.bn0.mean")
    check(ts2.gen_state["rb2"]["bn2"]["var"], gs2_t["rb2"]["bn2"]["var"],
          "gen.rb2.bn2.var")
