"""Golden tests for the BPS encoder against the reference's shipped
encodings (data/real_objects/bps/*.npy were produced by the CUDA bps_torch
path the reference uses; our encoder must reproduce them bit-near)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.ops import bps as bps_mod
from dexgangrasp_tpu.ops.bps import (
    BPSEncoder,
    bps_encode_pallas,
    bps_encode_xla,
    generate_basis,
    pad_cloud,
)
from dexgangrasp_tpu.ops.chamfer import chamfer_distance
from dexgangrasp_tpu.utils.pcd import load_pcd, save_pcd


def test_bps_golden_all_real_objects(basis, real_objects_dir):
    obj_dir = os.path.join(real_objects_dir, "object")
    bps_dir = os.path.join(real_objects_dir, "bps")
    names = [f[:-4] for f in os.listdir(bps_dir) if f.endswith(".npy")]
    assert len(names) >= 7
    for name in names:
        pts = load_pcd(os.path.join(obj_dir, name + ".pcd"))
        golden = np.load(os.path.join(bps_dir, name + ".npy")).ravel()
        enc = np.asarray(bps_encode_xla(jnp.asarray(basis), jnp.asarray(pts)))
        np.testing.assert_allclose(enc, golden, atol=2e-6)


def test_bps_padding_invariant(basis):
    rng = np.random.default_rng(2)
    pts = rng.uniform(-0.1, 0.1, size=(777, 3)).astype(np.float32)
    enc_raw = np.asarray(bps_encode_xla(jnp.asarray(basis), jnp.asarray(pts)))
    padded = pad_cloud(pts, 2048)
    enc_pad = np.asarray(bps_encode_xla(jnp.asarray(basis), jnp.asarray(padded)))
    np.testing.assert_allclose(enc_raw, enc_pad, atol=1e-6)


def test_bps_pallas_interpret_matches_xla(basis):
    """Pallas kernel correctness via the interpreter (no TPU needed)."""
    rng = np.random.default_rng(3)
    pts = pad_cloud(rng.uniform(-0.1, 0.1, size=(500, 3)).astype(np.float32),
                    1024)
    with jax.disable_jit():  # interpret mode needs eager pallas
        import jax.experimental.pallas as pl  # noqa
        # monkeypatch: call the kernel through interpret mode
        enc_xla = np.asarray(bps_encode_xla(jnp.asarray(basis), jnp.asarray(pts)))
    # run the real pallas_call in interpret mode by temporarily flagging
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        enc_pal = np.asarray(bps_encode_pallas(jnp.asarray(basis),
                                               jnp.asarray(pts)))
    np.testing.assert_allclose(enc_pal, enc_xla, atol=1e-5)


def test_encoder_facade(basis, real_objects_dir):
    enc = BPSEncoder(basis=basis, cloud_pad=4096)
    pts = load_pcd(os.path.join(real_objects_dir, "object", "red_mug.pcd"))
    golden = np.load(os.path.join(real_objects_dir, "bps", "red_mug.npy")).ravel()
    out = enc.encode(pts)
    # cloud_pad subsamples 72k → 4096 points; distances can only grow
    assert out.shape == (4096,)
    assert (out >= golden - 1e-5).all()
    # and with a large-enough pad it is exact
    enc_full = BPSEncoder(basis=basis, cloud_pad=131072)
    np.testing.assert_allclose(enc_full.encode(pts), golden, atol=2e-6)
    # centering check fires for an off-origin cloud
    with pytest.raises(ValueError):
        enc.encode(pts + 5.0)


def test_generate_basis_distribution():
    basis = np.asarray(generate_basis(jax.random.PRNGKey(0), 4096, 0.2))
    r = np.linalg.norm(basis, axis=1)
    assert basis.shape == (4096, 3)
    assert r.max() <= 0.2 + 1e-6
    # uniform in ball: median radius = 0.2 * (1/2)^(1/3) ≈ 0.1587
    assert abs(np.median(r) - 0.2 * 0.5 ** (1 / 3)) < 0.01


def test_chamfer_distance():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(300, 3)).astype(np.float32)
    # identical clouds → 0
    assert float(chamfer_distance(jnp.asarray(a), jnp.asarray(a))) < 1e-9
    # oracle: brute force numpy
    b = rng.normal(size=(200, 3)).astype(np.float32)
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    ref = d2.min(1).mean() + d2.min(0).mean()
    ours = float(chamfer_distance(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_pcd_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(123, 3)).astype(np.float32)
    p = str(tmp_path / "x.pcd")
    save_pcd(p, pts)
    back = load_pcd(p)
    np.testing.assert_allclose(back, pts, atol=0)


def test_pad_cloud_truncation_encoding_error_bounded(basis):
    """Golden bound for truncating subsample (VERDICT r2 next-10): an
    organized (row-major) over-budget cloud must encode close to the
    full-cloud encoding — an index-strided pick can alias onto scanlines/
    columns of the raster and blow the error up; the hashed subsample
    must keep it at the local point-spacing scale."""
    from dexgangrasp_tpu.ops.bps import bps_encode_xla, pad_cloud

    # organized raster of a curved sheet (RealSense-crop-like), ~20k pts,
    # ~1.4 mm spacing; truncate 10x to 2048
    H, W = 128, 160
    xs, ys = np.meshgrid(np.linspace(-0.09, 0.09, W),
                         np.linspace(-0.07, 0.07, H))
    zs = 0.03 * np.sin(xs * 40) * np.cos(ys * 40)
    cloud = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.float32)

    full = np.asarray(bps_encode_xla(jnp.asarray(basis),
                                     jnp.asarray(cloud)))
    trunc = pad_cloud(cloud, 2048)
    assert trunc.shape == (2048, 3)
    sub = np.asarray(bps_encode_xla(jnp.asarray(basis),
                                    jnp.asarray(trunc)))
    err = np.abs(sub - full)
    # distances can only grow when points are removed; bound the growth
    # by a few times the subsampled point spacing (~6 mm at 2048 pts over
    # the sheet)
    assert (sub >= full - 1e-6).all()
    assert err.max() < 0.02, err.max()
    assert err.mean() < 0.004, err.mean()


def test_pad_cloud_truncation_deterministic():
    from dexgangrasp_tpu.ops.bps import pad_cloud

    rng2 = np.random.default_rng(9)
    cloud = rng2.normal(size=(5000, 3)).astype(np.float32)
    a = pad_cloud(cloud, 1024)
    b = pad_cloud(cloud, 1024)
    np.testing.assert_array_equal(a, b)
    # subsample is a subset of the original points
    as_set = {tuple(r) for r in a.tolist()}
    orig = {tuple(r) for r in cloud.tolist()}
    assert as_set <= orig
