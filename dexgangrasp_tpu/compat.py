"""Drop-in compatibility façade: the reference's ``DexGanGrasp`` wrapper.

A user of the reference drives everything through one god object
(``DexGanGrasp/models/dexgangrasp.py:65``): construct with a cfg dict,
``load_dexgenerator``/``load_dexevaluator`` checkpoints, then
``generate_grasps`` / ``evaluate_grasps`` / ``filter_grasps`` /
``refine_grasps`` for inference and ``update_dexgangrasp`` /
``update_dexevaluator`` / ``update_learning_rate`` / ``save_*`` for
training.  This class exposes that exact surface on top of the TPU-native
stack (GanTrainer + GraspEngine), so reference call sites port by changing
one import.

Inputs/outputs keep the reference's conventions: string-keyed grasp dicts
(rot_matrix/transl/joint_conf), numpy in / numpy out when
``return_arr=True``, ValueError from ``filter_grasps`` when the best score
misses the threshold, loss dicts with the reference's key names.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from dexgangrasp_tpu.engine.pipeline import GraspEngine
from dexgangrasp_tpu.engine.refine import (
    refine_grasps_gradient,
    refine_grasps_sampling,
)
from dexgangrasp_tpu.train import checkpoints as ckpt
from dexgangrasp_tpu.train.gan import GanTrainer, set_lr
from dexgangrasp_tpu.train.schedule import PlateauScheduler
from dexgangrasp_tpu.utils.config import DEFAULTS, train_config_from_cfg


class DexGanGrasp:
    """Reference-API wrapper over the TPU-native engine + trainer."""

    def __init__(self, cfg: Optional[dict] = None):
        self.cfg = {**DEFAULTS, **(cfg or {})}
        self.is_train = self.cfg.get("is_train", True)
        self.trainer = GanTrainer(train_config_from_cfg(self.cfg))
        key = jax.random.PRNGKey(self.cfg.get("seed", 0))
        kg, ke = jax.random.split(key)
        self._gan_ts = self.trainer.init_gan_state(kg)
        self._eva_ts = self.trainer.init_evaluator_state(ke)
        self._sched_gen = PlateauScheduler(
            self.cfg["lr_gen"],
            patience=self.cfg["patience_lr_policy_plateau"],
            threshold=self.cfg["threshold_lr_policy_plateau"])
        self._sched_eva = PlateauScheduler(
            self.cfg["lr"],
            patience=self.cfg["patience_lr_policy_plateau"],
            threshold=self.cfg["threshold_lr_policy_plateau"])
        self._engine: Optional[GraspEngine] = None
        self._key = jax.random.PRNGKey(self.cfg.get("seed", 0) + 17)
        self._step = 0

    # ------------------------------------------------------------- engine

    def _invalidate_engine(self):
        self._engine = None

    @property
    def engine(self) -> GraspEngine:
        """Folded inference engine over the current weights (rebuilt lazily
        after any train/load step)."""
        if self._engine is None:
            basis = None
            if self.cfg.get("basis_path"):
                from dexgangrasp_tpu.ops.bps import load_basis

                basis = load_basis(self.cfg["basis_path"])
            self._engine = GraspEngine(
                self._gan_ts.gen_params, self._gan_ts.gen_state,
                self._eva_ts.params, self._eva_ts.state,
                disc_params=self._gan_ts.disc_params,
                disc_state=self._gan_ts.disc_state, basis=basis)
        return self._engine

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # --------------------------------------------------------- checkpoints

    def _resolve(self, epoch, load_path, suffix):
        """Reference path scheme: <load_path>/<epoch>_{gen,eva}_net.{npz,pt};
        epoch == -1 finds the newest (fixing dexgangrasp.py:574-577)."""
        load_path = load_path or self.cfg.get("load_path") or ""
        if epoch == -1:
            kind = "gen" if "gen" in suffix else "eva"
            epoch = ckpt.latest_epoch(load_path, kind)
            if epoch is None:
                raise FileNotFoundError(
                    f"no *_{kind}_net.npz checkpoints under {load_path}")
        for ext in (".npz", ".pt"):
            p = os.path.join(load_path, f"{epoch}{suffix}{ext}")
            if os.path.isfile(p):
                return p
        raise FileNotFoundError(
            os.path.join(load_path, f"{epoch}{suffix}(.npz|.pt)"))

    def load_dexgenerator(self, epoch, load_path: Optional[str] = None):
        import dataclasses

        path = self._resolve(epoch, load_path, "_gen_net")
        if path.endswith(".pt"):
            from dexgangrasp_tpu.models.torch_import import (
                load_reference_gen_checkpoint,
            )

            gp, gs, dp, ds, _ = load_reference_gen_checkpoint(path)
            self._gan_ts = dataclasses.replace(
                self._gan_ts, gen_params=jax.tree.map(jnp.asarray, gp),
                gen_state=jax.tree.map(jnp.asarray, gs),
                disc_params=jax.tree.map(jnp.asarray, dp),
                disc_state=jax.tree.map(jnp.asarray, ds))
        else:
            self._gan_ts, meta = ckpt.load_gan(path, ts_template=self._gan_ts)
            if self.is_train and "scheduler_gen" in meta:
                self._sched_gen.load_state_dict(meta["scheduler_gen"])
        self._invalidate_engine()

    def load_dexevaluator(self, epoch, load_path: Optional[str] = None):
        import dataclasses

        path = self._resolve(epoch, load_path, "_eva_net")
        if path.endswith(".pt"):
            from dexgangrasp_tpu.models.torch_import import (
                load_reference_eva_checkpoint,
            )

            ep, es, _ = load_reference_eva_checkpoint(path)
            self._eva_ts = dataclasses.replace(
                self._eva_ts, params=jax.tree.map(jnp.asarray, ep),
                state=jax.tree.map(jnp.asarray, es))
        else:
            self._eva_ts, meta = ckpt.load_evaluator(path, as_state=True)
            if self.is_train and "scheduler" in meta:
                self._sched_eva.load_state_dict(meta["scheduler"])
        self._invalidate_engine()

    def save_dexgenerator(self, net_name, epoch):
        """Reference signature (net_name is the file stem prefix)."""
        save_dir = self.cfg.get("save_dir", ".")
        os.makedirs(save_dir, exist_ok=True)
        return ckpt.save_gan(save_dir, net_name, self._gan_ts,
                             scheduler_gen=self._sched_gen)

    def save_dexevaluator(self, net_name, epoch):
        save_dir = self.cfg.get("save_dir", ".")
        os.makedirs(save_dir, exist_ok=True)
        return ckpt.save_evaluator(save_dir, net_name, self._eva_ts,
                                   scheduler=self._sched_eva)

    # ----------------------------------------------------------- inference

    def generate_grasps(self, bps, n_samples: int, return_arr: bool = True,
                        z_offset: float = 0.025):
        return self.engine.generate_grasps(bps, n_samples,
                                           return_arr=return_arr,
                                           z_offset=z_offset)

    def evaluate_grasps(self, bps, grasps, thresh: float = 0.5,
                        return_arr: bool = True):
        return self.engine.evaluate_grasps(bps, grasps,
                                           return_arr=return_arr)

    def filter_grasps(self, bps, grasps, thresh: float = 0.5,
                      return_arr: bool = True):
        return self.engine.filter_grasps(bps, grasps, thresh=thresh,
                                         return_arr=return_arr)

    def filter_grasps_discriminator(self, bps, grasps, thresh: float = 0.5,
                                    return_arr: bool = True):
        return self.engine.filter_grasps(bps, grasps, thresh=thresh,
                                         return_arr=return_arr,
                                         use_discriminator=True)

    def refine_grasps(self, data: Dict, refine_method: str,
                      num_refine_steps: int = 10):
        """Reference dexgangrasp.py:619-660: returns (refined_data list,
        refined_success list-like trajectory)."""
        bps = jnp.asarray(np.asarray(data["bps_object"]).reshape(-1, 4096)[0],
                          jnp.float32)
        rot = jnp.asarray(data["rot_matrix"], jnp.float32)
        transl = jnp.asarray(data["transl"], jnp.float32)
        joints = jnp.asarray(data["joint_conf"], jnp.float32)
        if refine_method == "gradient":
            rot, transl, joints, traj = refine_grasps_gradient(
                self.engine.eva_folded, bps, rot, transl, joints,
                num_steps=num_refine_steps)
        else:
            rot, transl, joints, traj = refine_grasps_sampling(
                self.engine.eva_folded, bps, rot, transl, joints,
                self._next_key(), num_steps=num_refine_steps)
        refined = {"rot_matrix": np.asarray(rot), "transl": np.asarray(transl),
                   "joint_conf": np.asarray(joints)}
        return [refined], np.asarray(traj)

    # ------------------------------------------------------------ training

    def update_dexgangrasp(self, real_data: Dict, is_train_gen: bool = True
                           ) -> Dict:
        batch = {k: jnp.asarray(np.asarray(v)) for k, v in real_data.items()
                 if k in ("bps_object", "rot_matrix", "transl", "joint_conf",
                          "z")}
        self._gan_ts, logs = self.trainer.gan_step(
            self._gan_ts, batch, self._next_key(),
            is_train_gen=is_train_gen)
        self._invalidate_engine()
        return {k: np.asarray(v) for k, v in logs.items()}

    def update_dexevaluator(self, data: Dict) -> Dict:
        batch = {k: jnp.asarray(np.asarray(v)) for k, v in data.items()
                 if k in ("bps_object", "rot_matrix", "transl", "joint_conf",
                          "label")}
        self._eva_ts, logs = self.trainer.evaluator_step(
            self._eva_ts, batch, self._next_key())
        self._invalidate_engine()
        return {k: np.asarray(v) for k, v in logs.items()}

    def update_learning_rate(self, eval_loss_dict: Dict) -> None:
        """Plateau-anneal the optimizers actually used by the update steps
        (the reference steps a scheduler on an unused optimizer —
        dexgangrasp.py:727-737; documented fix)."""
        if "total_loss_gen" in eval_loss_dict:
            lr = self._sched_gen.step(float(eval_loss_dict["total_loss_gen"]))
            set_lr(self._gan_ts.gen_opt, lr)
            set_lr(self._gan_ts.disc_opt, lr)
        if "total_loss_eva" in eval_loss_dict:
            lr = self._sched_eva.step(float(eval_loss_dict["total_loss_eva"]))
            set_lr(self._eva_ts.opt, lr)

    def eval_dexgangrasp_generator_loss(self, real_data: Dict) -> Dict:
        batch = {k: jnp.asarray(np.asarray(v)) for k, v in real_data.items()
                 if k in ("bps_object", "rot_matrix", "transl", "joint_conf")}
        logs = self.trainer.eval_gan_losses(self._gan_ts, batch,
                                            self._next_key())
        return {k: np.asarray(v) for k, v in logs.items()}

    def eval_dexevaluator_loss(self, data: Dict) -> Dict:
        batch = {k: jnp.asarray(np.asarray(v)) for k, v in data.items()
                 if k in ("bps_object", "rot_matrix", "transl", "joint_conf",
                          "label")}
        logs = self.trainer.eval_evaluator(self._eva_ts, batch)
        return {k: np.asarray(v) for k, v in logs.items()
                if k in ("total_loss_eva", "bce_loss")}
