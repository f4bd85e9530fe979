"""MAGD parity tests: our vectorized metric vs a literal reimplementation of
the reference's loop-based math (eval.py:63-137) on the real eval fixture."""
import numpy as np
import pytest

import jax.numpy as jnp

from dexgangrasp_tpu.eval.eval_batch import load_eval_batch
from dexgangrasp_tpu.eval.magd import (
    magd_for_grasp_distribution,
    magd_jax,
    pairwise_rot_geodesic,
    pairwise_transl_sq,
)

rng = np.random.default_rng(21)


def ref_magd(grasp1, grasp2):
    """Oracle: reference eval.py:63-137 with its python loops, verbatim
    semantics."""
    def eucl(pt1, pt2):
        dist_mat = np.zeros((pt1.shape[0], pt2.shape[0]))
        for idx in range(pt1.shape[0]):
            deltas = pt2 - pt1[idx]
            dist_mat[idx] = np.einsum("ij,ij->i", deltas, deltas)
        return dist_mat

    def geo(r1s, r2s):
        rrt = np.einsum("aij,bkj->abik", r1s, r2s, optimize=True)
        tr = np.trace(rrt, axis1=-2, axis2=-1)
        return np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0))

    transl_mat = eucl(grasp1["transl"], grasp2["transl"])
    rot_mat = geo(grasp1["rot_matrix"], grasp2["rot_matrix"])
    joint_mat = eucl(grasp1["joint_conf"], grasp2["joint_conf"])
    transl_loss = np.min(transl_mat, axis=1)
    rot_loss = np.zeros_like(transl_loss)
    joint_loss = np.zeros_like(transl_loss)
    cor_idxs = []
    for idx in range(transl_loss.shape[0]):
        c = np.argmin(transl_mat[idx])
        cor_idxs.append(c)
        rot_loss[idx] = rot_mat[idx, c]
        joint_loss[idx] = joint_mat[idx, c]
    uniq = sorted(set(cor_idxs), key=cor_idxs.index)
    coverage = len(uniq) / len(grasp2["transl"])
    return (np.sum(transl_loss), np.sum(rot_loss), np.sum(joint_loss), coverage)


def _random_grasp_set(n, nj=12):
    from scipy.spatial.transform import Rotation
    return {
        "transl": rng.normal(size=(n, 3)) * 0.1,
        "rot_matrix": Rotation.random(n, rng=rng).as_matrix(),
        "joint_conf": rng.uniform(0, 1, size=(n, nj)),
    }


def test_magd_matches_reference_random():
    for n, m in [(10, 25), (50, 7), (1, 1), (64, 64)]:
        pred = _random_grasp_set(n)
        gt = _random_grasp_set(m)
        ours = magd_for_grasp_distribution(pred, gt)
        ref = ref_magd(pred, gt)
        np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_magd_on_eval_batch_fixture():
    """Use the shipped 64-object fixture as pred AND gt → transl/rot/joint
    sums must be 0 and coverage 1 (identity sanity), then perturb."""
    batch = load_eval_batch()
    assert batch["bps_object"].shape == (64, 4096)
    fix = {k: batch[k] for k in ("transl", "rot_matrix", "joint_conf")}
    t, r, j, cov = magd_for_grasp_distribution(dict(fix), dict(fix))
    assert t == 0.0 and j == 0.0 and cov == 1.0
    assert r < 1e-5  # arccos noise at tr≈3
    # perturbed pred vs gt — parity against oracle on real data
    pred = {
        "transl": fix["transl"] + rng.normal(size=(64, 3)) * 0.01,
        "rot_matrix": fix["rot_matrix"],
        "joint_conf": fix["joint_conf"] + rng.normal(size=(64, 12)) * 0.1,
    }
    ours = magd_for_grasp_distribution(dict(pred), dict(fix))
    ref = ref_magd(pred, fix)
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_make_and_save_eval_batch(tmp_path):
    from dexgangrasp_tpu.data.synthetic import build_synthetic_dataset
    from dexgangrasp_tpu.data.datasets import DexGeneratorDataSet
    from dexgangrasp_tpu.eval.eval_batch import (
        load_eval_batch,
        make_eval_batch,
        save_eval_batch,
    )

    d = str(tmp_path / "ds")
    build_synthetic_dataset(d, n_objects=4, views_per_object=1,
                            grasps_per_object=6, points_per_cloud=256)
    ds = DexGeneratorDataSet(d, "eval")
    batch = make_eval_batch(ds, batch_size=8)
    p = save_eval_batch(batch, str(tmp_path / "eval_batch.npz"))
    back = load_eval_batch(p)
    np.testing.assert_allclose(back["bps_object"], batch["bps_object"],
                               atol=0)
    assert back["obj_name"] == batch["obj_name"]
    assert back["rot_matrix"].shape == (8, 3, 3)


def test_magd_jax_consistent():
    pred = _random_grasp_set(40)
    gt = _random_grasp_set(30)
    ref = magd_for_grasp_distribution(dict(pred), dict(gt))
    t, r, j, nm = magd_jax(
        jnp.asarray(pred["transl"], jnp.float32),
        jnp.asarray(pred["rot_matrix"], jnp.float32),
        jnp.asarray(pred["joint_conf"], jnp.float32),
        jnp.asarray(gt["transl"], jnp.float32),
        jnp.asarray(gt["rot_matrix"], jnp.float32),
        jnp.asarray(gt["joint_conf"], jnp.float32))
    np.testing.assert_allclose(float(t), ref[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(r), ref[1], rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(float(j), ref[2], rtol=1e-4, atol=1e-3)
    assert float(nm) / gt["transl"].shape[0] == ref[3]
