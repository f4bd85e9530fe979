"""Training drivers for the VAE and diffusion generator families.

Lighter-weight than the GAN TrainDriver (no discriminator/evaluator
interleaving): epoch loop over the generator dataset, periodic eval-split
loss, npz checkpoints compatible with engine loading
(``fold_generator(trees['gen_params'], trees['gen_state'])`` for the VAE
decoder; diffusion checkpoints carry params + normalizer).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.data.datasets import DexGeneratorDataSet
from dexgangrasp_tpu.data.loader import BatchLoader
from dexgangrasp_tpu.train.checkpoints import save_pytrees
from dexgangrasp_tpu.utils.writer import Writer


def _jx(batch: Dict) -> Dict:
    return {k: jnp.asarray(v) for k, v in batch.items()
            if not isinstance(v, list)}


def train_vae(cfg: dict, num_epochs: Optional[int] = None) -> Dict:
    """cVAE family training (model: vae)."""
    from dexgangrasp_tpu.models.vae import DexVAE
    from dexgangrasp_tpu.train.vae import VaeTrainer

    writer = Writer(cfg["save_dir"], cfg.get("to_tensorboard", True))
    model = DexVAE(latent_dim=cfg["latentD"], n_joints=cfg["n_hand_joints"])
    trainer = VaeTrainer(model, lr=cfg["lr"], beta1=cfg["beta1"],
                         weight_decay=cfg["weight_decay"],
                         kl_coef=cfg["kl_coef"])
    ts = trainer.init_state(jax.random.PRNGKey(cfg.get("seed", 0)))
    ds = DexGeneratorDataSet(cfg["data_dir"], "train",
                             group_joints=cfg["is_group_joints"])
    key = jax.random.PRNGKey(cfg.get("seed", 0) + 1)
    num_epochs = num_epochs or cfg["num_epochs"]
    logs = {}
    for epoch in range(1, num_epochs + 1):
        for batch in BatchLoader(ds, cfg["batch_size"]):
            key, k = jax.random.split(key)
            ts, logs = trainer.train_step(ts, _jx(batch), k)
        writer.print_current_train_loss(epoch, 0, logs)
        if epoch % cfg["save_freq"] == 0 or epoch == num_epochs:
            # gen_params/gen_state keys so the engine loader Just Works
            save_pytrees(
                os.path.join(cfg["save_dir"], f"{epoch}_vae_net.npz"),
                {"params": ts.params, "state": ts.state, "opt": ts.opt,
                 "gen_params": ts.params["decoder"],
                 "gen_state": ts.state["decoder"], "step": ts.step},
                {"epoch": epoch, "family": "vae"})
    writer.close()
    return {k: float(v) for k, v in logs.items()}


def train_set(cfg: dict, num_steps: Optional[int] = None) -> Dict:
    """Set-prediction transformer family training (model: set) —
    DETR-style Hungarian-matched regression over each view's full GT
    grasp set (train/set_transformer.py)."""
    from dexgangrasp_tpu.core.rotations import ortho6d_from_rot_matrix
    from dexgangrasp_tpu.models.diffusion import (
        GraspNormalizer,
        grasp_vector,
    )
    from dexgangrasp_tpu.models.grasp_transformer import GraspTransformer
    from dexgangrasp_tpu.train.set_transformer import (
        SetTrainer,
        build_set_table,
        train_set_transformer,
    )

    writer = Writer(cfg["save_dir"], cfg.get("to_tensorboard", True))
    ds = DexGeneratorDataSet(cfg["data_dir"], "train",
                             group_joints=cfg["is_group_joints"])
    big = ds.sample_batch(min(4096, len(ds)))
    g_all = grasp_vector(
        ortho6d_from_rot_matrix(jnp.asarray(big["rot_matrix"], jnp.float32)),
        jnp.asarray(big["transl"], jnp.float32),
        jnp.asarray(big["joint_conf"], jnp.float32))
    normalizer = GraspNormalizer.fit(g_all)
    model = GraspTransformer(n_joints=cfg["n_hand_joints"])
    trainer = SetTrainer(model, lr=cfg.get("lr", 1e-4),
                         normalizer=normalizer)
    ts = trainer.init_state(jax.random.PRNGKey(cfg.get("seed", 0)))
    table = build_set_table(ds, seed=cfg.get("seed", 0))
    steps_per_epoch = max(1, table["bps"].shape[0] // 8)
    num_steps = num_steps or cfg["num_epochs"] * steps_per_epoch
    ts, history = train_set_transformer(
        trainer, ts, table, num_steps,
        batch_views=min(32, table["bps"].shape[0]),
        seed=cfg.get("seed", 0),
        eval_every=max(1, num_steps // 10),
        log=lambda s: print(f"[set] {s}", flush=True))
    save_pytrees(
        os.path.join(cfg["save_dir"], f"{num_steps}_set_net.npz"),
        {"params": ts.params, "opt": ts.opt, "step": ts.step,
         "normalizer_mean": normalizer.mean,
         "normalizer_std": normalizer.std},
        {"epoch": num_steps, "family": "set"})
    writer.close()
    return history[-1] if history else {}


def train_diffusion(cfg: dict, num_steps: Optional[int] = None) -> Dict:
    """Diffusion family training (model: diffusion); step-based like DDPM
    practice, ``num_epochs``·steps_per_epoch if not given."""
    from dexgangrasp_tpu.core.rotations import ortho6d_from_rot_matrix
    from dexgangrasp_tpu.models.diffusion import (
        DexDiffuser,
        GraspNormalizer,
        grasp_vector,
    )
    from dexgangrasp_tpu.train.diffusion import DiffusionTrainer

    writer = Writer(cfg["save_dir"], cfg.get("to_tensorboard", True))
    ds = DexGeneratorDataSet(cfg["data_dir"], "train",
                             group_joints=cfg["is_group_joints"])
    # fit the normalizer on a large sample
    big = ds.sample_batch(min(4096, len(ds)))
    g_all = grasp_vector(
        ortho6d_from_rot_matrix(jnp.asarray(big["rot_matrix"], jnp.float32)),
        jnp.asarray(big["transl"], jnp.float32),
        jnp.asarray(big["joint_conf"], jnp.float32))
    normalizer = GraspNormalizer.fit(g_all)
    model = DexDiffuser(n_joints=cfg["n_hand_joints"])
    trainer = DiffusionTrainer(model, lr=cfg.get("lr", 3e-4),
                               normalizer=normalizer)
    ts = trainer.init_state(jax.random.PRNGKey(cfg.get("seed", 0)))
    steps_per_epoch = max(1, len(ds) // cfg["batch_size"])
    num_steps = num_steps or cfg["num_epochs"] * steps_per_epoch
    key = jax.random.PRNGKey(cfg.get("seed", 0) + 1)
    loss = jnp.zeros(())
    for i in range(1, num_steps + 1):
        key, k = jax.random.split(key)
        batch = ds.sample_batch(cfg["batch_size"])
        bps, g0 = trainer.batch_to_g0(_jx(batch))
        ts, loss = trainer.train_step(ts, bps, g0, k)
        if i % max(1, num_steps // 10) == 0:
            writer.print_current_train_loss(i // steps_per_epoch, i,
                                            {"eps_mse": loss})
        if i % (cfg["save_freq"] * steps_per_epoch) == 0 or i == num_steps:
            save_pytrees(
                os.path.join(cfg["save_dir"], f"{i}_diffusion_net.npz"),
                {"params": ts.params, "opt": ts.opt, "step": ts.step,
                 "normalizer_mean": normalizer.mean,
                 "normalizer_std": normalizer.std},
                {"epoch": i, "family": "diffusion"})
    writer.close()
    return {"eps_mse": float(loss)}
