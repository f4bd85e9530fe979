"""Sharding specs + sharded step wrappers.

Strategy:

- **Training** (dp × optional tp): the batch axis is sharded over ``data``;
  parameters are replicated, except the wide BPS-facing Linear layers which
  can shard their hidden dimension over ``model`` (column-parallel fc1/fc3,
  row-parallel fc2 — GSPMD inserts the reduce).  Gradient reduction over
  ``data`` is inserted automatically by jit given the shardings; this is
  the TPU-native replacement for DataParallel's replicate/gather.
- **Inference**: the grasp axis (z batch) is sharded over the whole mesh;
  the folded object context is replicated (it is ~KBs).

All functions are mesh-generic: they work on a single device, 8 virtual
CPU devices, or a real pod slice.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def dp_axes(mesh: Mesh) -> tuple:
    """The data-parallel mesh axes, outermost first: ('dcn', 'data') on a
    multi-slice mesh, ('data',) on a single slice.  A batch dimension
    sharded over the tuple spans both wires; GSPMD emits a hierarchical
    all-reduce (ICI within a slice, then DCN across slices)."""
    axes = tuple(a for a in ("dcn", "data") if a in mesh.axis_names)
    return axes or (mesh.axis_names[0],)


def batch_spec(mesh: Mesh) -> P:
    return P(dp_axes(mesh))


def replicated_spec() -> P:
    return P()


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Put a host batch onto the mesh, leading axis sharded over 'data'."""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
            spec = P(*((batch_spec(mesh)[0],) + (None,) * (v.ndim - 1)))
            out[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, spec))
        else:
            out[k] = v
    return out


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


# --------------------------------------------------- tensor-parallel specs


def _resblock_specs(has_model_axis: bool) -> Dict:
    """PartitionSpecs for one ResBlock's params.  Column-parallel fc1/fc3
    (output dim sharded), row-parallel fc2 (input dim sharded)."""
    if not has_model_axis:
        return {
            "fc1": {"w": P(), "b": P()}, "fc2": {"w": P(), "b": P()},
            "fc3": {"w": P(), "b": P()},
            "bn1": {"scale": P(), "bias": P()},
            "bn2": {"scale": P(), "bias": P()},
        }
    return {
        "fc1": {"w": P(None, "model"), "b": P("model")},
        "fc2": {"w": P("model", None), "b": P()},
        "fc3": {"w": P(None, "model"), "b": P("model")},
        "bn1": {"scale": P("model"), "bias": P("model")},
        "bn2": {"scale": P(), "bias": P()},
    }


def _resblock_state_specs(has_model_axis: bool) -> Dict:
    if not has_model_axis:
        return {"bn1": {"mean": P(), "var": P()},
                "bn2": {"mean": P(), "var": P()}}
    return {"bn1": {"mean": P("model"), "var": P("model")},
            "bn2": {"mean": P(), "var": P()}}


def gan_param_specs(mesh: Mesh) -> Dict:
    """Specs for (gen_params, gen_state, disc_params, disc_state).

    With a 'model' axis, ResBlock hidden dims shard tensor-parallel; the
    small heads and BN over full-width features stay replicated.  fc2's bn2
    output is full-width → replicated (GSPMD reduces fc2's row-parallel
    partial sums automatically).
    """
    tp = "model" in mesh.axis_names and mesh.shape["model"] > 1
    rb_p = _resblock_specs(tp)
    rb_s = _resblock_state_specs(tp)
    gen_p = {
        "bn0": {"scale": P(), "bias": P()},
        "rb1": rb_p, "rb2": rb_p,
        "joint_conf": {"w": P(), "b": P()},
        "rot": {"w": P(), "b": P()},
        "transl": {"w": P(), "b": P()},
    }
    gen_s = {"bn0": {"mean": P(), "var": P()}, "rb1": rb_s, "rb2": rb_s}
    disc_p = {
        "bn0": {"scale": P(), "bias": P()},
        "rb1": rb_p, "rb2": rb_p,
        "out": {"w": P(), "b": P()},
    }
    disc_s = {"bn0": {"mean": P(), "var": P()}, "rb1": rb_s, "rb2": rb_s}
    return {"gen_params": gen_p, "gen_state": gen_s,
            "disc_params": disc_p, "disc_state": disc_s}


def evaluator_param_specs(mesh: Mesh, n_resblocks: int = 3) -> Dict:
    tp = "model" in mesh.axis_names and mesh.shape["model"] > 1
    rb_p = _resblock_specs(tp)
    rb_s = _resblock_state_specs(tp)
    names = [f"rb{i + 1}" for i in range(n_resblocks)]
    return {
        "params": {"bn1": {"scale": P(), "bias": P()},
                   **{n: rb_p for n in names},
                   "out": {"w": P(), "b": P()}},
        "state": {"bn1": {"mean": P(), "var": P()},
                  **{n: rb_s for n in names}},
    }


# ------------------------------------------------------------ sharded steps


def sharded_gan_step(trainer, mesh: Mesh):
    """Wrap ``trainer.gan_step`` with explicit mesh shardings: batch over
    'data', train state replicated (tp specs can be layered via device_put
    of the state before calling).  Gradient psums over 'data' are inserted
    by GSPMD."""
    rep = NamedSharding(mesh, P())

    dp = dp_axes(mesh)

    def place_batch(batch):
        out = {}
        for k, v in batch.items():
            if not hasattr(v, "ndim"):  # pcd_path / obj_name string lists
                continue
            spec = P(*((dp,) + (None,) * (v.ndim - 1)))
            out[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, spec))
        return out

    def step(ts, batch, key, is_train_gen=True):
        batch = place_batch(batch)
        key = jax.device_put(key, rep)
        return trainer.gan_step(ts, batch, key, is_train_gen=is_train_gen)

    return step


def sharded_sample_and_score(mesh: Mesh):
    """Grasp-axis-sharded fused inference: z batch split over every device,
    folded params/context replicated.  Returns a callable like
    engine.pipeline.sample_and_score."""
    from dexgangrasp_tpu.engine.pipeline import sample_and_score

    rep = NamedSharding(mesh, P())
    axis = dp_axes(mesh)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(gen_folded, eva_folded, bps, key, n):
        g = sample_and_score(gen_folded, eva_folded, bps, key, n)
        # constrain the outputs to stay sharded over the grasp axis
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(*((axis,) + (None,) * (x.ndim - 1)))))
            if hasattr(x, "ndim") and x.ndim >= 1 else x, g)

    def call(gen_folded, eva_folded, bps, key, n):
        gen_folded = jax.device_put(gen_folded, rep)
        eva_folded = jax.device_put(eva_folded, rep)
        bps = jax.device_put(jnp.asarray(bps), rep)
        return run(gen_folded, eva_folded, bps, key, n)

    return call


def sharded_sample_and_score_chain(mesh: Mesh):
    """Grasp-axis-sharded fused inference through the per-grasp-chain
    Pallas mega-kernel (ops/grasp_chain.py).

    ``pallas_call`` does not auto-partition under GSPMD, so the kernel is
    placed per device with ``shard_map``: the latent batch is split over
    the data-parallel axes, the folded weights + per-object context folds
    ride in replicated, and every device runs the whole chain on its
    slice — zero collectives in the hot path (top-k afterwards is the
    consumer's, same contract as ``sharded_sample_and_score``).

    ``n`` must divide by the number of devices on the dp axes.
    """
    from dexgangrasp_tpu.core.grasp import Grasps
    from dexgangrasp_tpu.engine import folding
    from dexgangrasp_tpu.ops.grasp_chain import grasp_chain_pallas

    try:
        shard_map = jax.shard_map
    except AttributeError:  # older jax
        from jax.experimental.shard_map import shard_map

    rep = NamedSharding(mesh, P())
    axis = dp_axes(mesh)
    n_shards = 1
    for a in axis:
        n_shards *= mesh.shape[a]

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(gen_folded, eva_folded, bps, key, n):
        assert n % n_shards == 0, (n, n_shards)
        latent = gen_folded["rb1"]["w1_z"].shape[0]
        z = jax.random.normal(key, (n, latent), jnp.float32)
        z = jax.lax.with_sharding_constraint(
            z, NamedSharding(mesh, P(axis)))
        gctx = folding.generator_object_context(gen_folded, bps)
        ectx = folding.evaluator_object_context(eva_folded, bps)
        n_joints = gen_folded["joint_conf"]["w"].shape[1]

        def local(gf, ef, gc, ec, z_local):
            return grasp_chain_pallas(gf, ef, gc, ec, z_local,
                                      n_joints=n_joints)

        # check_vma=False: pallas_call's out_shape carries no varying-
        # mesh-axes annotation; the out_specs below are the contract
        rot, transl, joints, score = shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(axis)),
            out_specs=(P(axis), P(axis), P(axis), P(axis)),
            check_vma=False)(
                gen_folded, eva_folded, gctx, ectx, z)
        return Grasps(transl=transl, rot_matrix=rot, joint_conf=joints,
                      score=score, z=z)

    def call(gen_folded, eva_folded, bps, key, n):
        gen_folded = jax.device_put(gen_folded, rep)
        eva_folded = jax.device_put(eva_folded, rep)
        bps = jax.device_put(jnp.asarray(bps), rep)
        return run(gen_folded, eva_folded, bps, key, n)

    return call
