"""Reference-checkpoint interop: a torch checkpoint in the reference's
on-disk format (legacy ffh* keys) drives both a torch reimplementation of
the reference inference path and our fused engine — outputs must agree.

This is the strongest available weight-parity evidence given the mount's
LFS-stub checkpoints (SURVEY §6): the *machinery* (key mapping, BN
semantics, 6D rotation, z-offset back-off, evaluator scoring) is proven
equivalent end-to-end, so real reference weights drop in unchanged.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.engine.pipeline import GraspEngine
from dexgangrasp_tpu.models.torch_import import (
    load_reference_eva_checkpoint,
    load_reference_gen_checkpoint,
)

from torch_oracle import TorchDiscriminator, TorchEvaluator, TorchGenerator

rng = np.random.default_rng(111)


@pytest.fixture(scope="module")
def reference_ckpts(tmp_path_factory):
    """Write reference-format .pt checkpoints from the torch oracle."""
    d = tmp_path_factory.mktemp("ref_ckpts")
    torch.manual_seed(7)
    gen = TorchGenerator().eval()
    disc = TorchDiscriminator().eval()
    eva = TorchEvaluator().eval()
    for net in (gen, disc, eva):
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    # the reference saves gen+disc in one state dict with prefixes
    # (dexgangrasp.py:694-709) under 'ffhgenerator_state_dict'
    sd = {}
    for k, v in gen.state_dict().items():
        sd["generator." + k] = v
    for k, v in disc.state_dict().items():
        sd["discriminator." + k] = v
    torch.save({"epoch": 32, "ffhgenerator_state_dict": sd},
               str(d / "32_gen_net.pt"))
    torch.save({"epoch": 30, "ffhevaluator_state_dict": eva.state_dict()},
               str(d / "30_eva_net.pt"))
    return str(d), gen, disc, eva


def torch_rot_from_ortho6d(o6):
    x_raw, y_raw = o6[:, 0:3], o6[:, 3:6]

    def norm(v):
        mag = torch.sqrt(v.pow(2).sum(1))
        return v / torch.max(mag, torch.tensor([1e-8])).view(-1, 1)

    x = norm(x_raw)
    z = norm(torch.cross(x, y_raw, dim=1))
    y = torch.cross(z, x, dim=1)
    return torch.cat([x.view(-1, 3, 1), y.view(-1, 3, 1), z.view(-1, 3, 1)], 2)


def test_checkpoint_roundtrip_through_engine(reference_ckpts):
    d, gen_t, disc_t, eva_t = reference_ckpts
    gp, gs, dp, ds, epoch = load_reference_gen_checkpoint(d + "/32_gen_net.pt")
    ep, es, epoch_e = load_reference_eva_checkpoint(d + "/30_eva_net.pt")
    assert epoch == 32 and epoch_e == 30

    engine = GraspEngine(gp, gs, ep, es, disc_params=dp, disc_state=ds)
    bps = rng.uniform(0, 0.2, 4096).astype(np.float32)
    n = 64
    out = engine.generate(bps, n, seed=5)
    z = np.asarray(out.z)

    # torch replica of the reference inference path (generate_poses,
    # networks.py:223-255): tile bps, forward, 6D→mat, z-offset back-off
    with torch.no_grad():
        bps_tiled = torch.from_numpy(np.tile(bps, (n, 1)))
        rot6, transl, joints = gen_t(torch.from_numpy(z), bps_tiled)
        R = torch_rot_from_ortho6d(rot6)
        transl = transl - 0.025 * R[:, :, 0]
        p = eva_t(bps_tiled, R.reshape(n, 9), transl)

    order = np.argsort(-p.numpy()[:, 0], kind="stable")
    np.testing.assert_allclose(np.asarray(out.score),
                               p.numpy()[order, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.transl),
                               transl.numpy()[order], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.joint_conf),
                               joints.numpy()[order], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.rot_matrix),
                               R.numpy()[order], atol=1e-4)


def test_export_roundtrip_through_pt_files(reference_ckpts, tmp_path):
    """our params → reference-layout .pt files → re-import → identical."""
    from dexgangrasp_tpu.models.torch_import import (
        save_reference_eva_checkpoint,
        save_reference_gen_checkpoint,
    )

    d, gen_t, disc_t, eva_t = reference_ckpts
    gp, gs, dp, ds, _ = load_reference_gen_checkpoint(d + "/32_gen_net.pt")
    ep, es, _ = load_reference_eva_checkpoint(d + "/30_eva_net.pt")
    p1 = save_reference_gen_checkpoint(str(tmp_path / "9_gen_net.pt"),
                                       gp, gs, dp, ds, epoch=9)
    p2 = save_reference_eva_checkpoint(str(tmp_path / "9_eva_net.pt"),
                                       ep, es, epoch=9)
    gp2, gs2, dp2, ds2, epoch = load_reference_gen_checkpoint(p1)
    ep2, es2, epoch_e = load_reference_eva_checkpoint(p2)
    assert epoch == 9 and epoch_e == 9
    import jax

    for a, b in zip(jax.tree.leaves((gp, gs, dp, ds, ep, es)),
                    jax.tree.leaves((gp2, gs2, dp2, ds2, ep2, es2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    # and torch itself can load the exported state dict into the oracle
    import torch

    sd = torch.load(p1, map_location="cpu",
                    weights_only=False)["ffhgenerator_state_dict"]
    gen_new = type(gen_t)()
    gen_new.load_state_dict(
        {k.replace("generator.", ""): v for k, v in sd.items()
         if k.startswith("generator.")})


def test_discriminator_scorer_matches_torch(reference_ckpts):
    d, gen_t, disc_t, eva_t = reference_ckpts
    gp, gs, dp, ds, _ = load_reference_gen_checkpoint(d + "/32_gen_net.pt")
    ep, es, _ = load_reference_eva_checkpoint(d + "/30_eva_net.pt")
    engine = GraspEngine(gp, gs, ep, es, disc_params=dp, disc_state=ds)
    bps = rng.uniform(0, 0.2, 4096).astype(np.float32)
    grasps = engine.generate_grasps(bps, 32, seed=9)
    filt = engine.filter_grasps(bps, grasps, thresh=-1.0,
                                use_discriminator=True)
    with torch.no_grad():
        bps_tiled = torch.from_numpy(np.tile(bps, (32, 1)))
        score_t = disc_t(
            bps_tiled,
            torch.from_numpy(grasps["rot_matrix"].reshape(32, 9).astype(np.float32)),
            torch.from_numpy(grasps["transl"].astype(np.float32)),
            torch.from_numpy(grasps["joint_conf"].astype(np.float32)))
    ref_sorted = np.sort(score_t.numpy()[:, 0])[::-1]
    np.testing.assert_allclose(filt["score"], ref_sorted, atol=1e-5)
