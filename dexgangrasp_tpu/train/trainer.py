"""Epoch-loop training driver.

The equivalent of reference ``train.py:162-315``: GAN and/or evaluator
epochs over their datasets with periodic logging (Writer), checkpointing
every ``save_freq`` epochs, eval-split loss runs, plateau LR scheduling and
early stopping — all on top of the jitted steps in gan.py and the
prefetching BatchLoader.
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

import jax

from dexgangrasp_tpu.data.datasets import (
    DexEvaluatorDataSet,
    DexGeneratorDataSet,
)
from dexgangrasp_tpu.data.loader import BatchLoader
from dexgangrasp_tpu.train import checkpoints as ckpt
from dexgangrasp_tpu.train.gan import GanTrainer, set_lr
from dexgangrasp_tpu.train.schedule import EarlyStopping, PlateauScheduler
from dexgangrasp_tpu.utils.config import train_config_from_cfg
from dexgangrasp_tpu.utils.writer import Writer


def _mean_logs(logs_list) -> Dict[str, float]:
    keys = set().union(*(l.keys() for l in logs_list)) if logs_list else set()
    out = {}
    for k in keys:
        vals = [float(l[k]) for l in logs_list
                if k in l and np.ndim(l[k]) == 0]
        if vals:
            out[k] = float(np.mean(vals))
    return out


class TrainDriver:
    def __init__(self, cfg: dict, mesh=None):
        """cfg: parsed YAML dict (utils.config.Config).  mesh: optional
        jax Mesh for data-parallel training."""
        self.cfg = cfg
        self.tcfg = train_config_from_cfg(cfg)
        self.trainer = GanTrainer(self.tcfg)
        self.mesh = mesh
        self.writer = Writer(cfg["save_dir"], cfg.get("to_tensorboard", True))
        self.train_gen_flag = cfg.get("train_ffhgenerator", True)
        self.train_eva_flag = cfg.get("train_ffhevaluator", False)

        key = jax.random.PRNGKey(cfg.get("seed", 0))
        kg, ke = jax.random.split(key)
        self.gan_ts = self.trainer.init_gan_state(kg)
        self.eva_ts = self.trainer.init_evaluator_state(ke)
        self.sched_gen = PlateauScheduler(
            cfg["lr_gen"], patience=cfg["patience_lr_policy_plateau"],
            threshold=cfg["threshold_lr_policy_plateau"])
        self.sched_eva = PlateauScheduler(
            cfg["lr"], patience=cfg["patience_lr_policy_plateau"],
            threshold=cfg["threshold_lr_policy_plateau"])
        self.estop_gen = EarlyStopping()
        self.estop_eva = EarlyStopping()
        self.start_epoch = 1

        if cfg.get("continue_train") and cfg.get("load_path"):
            self._resume(cfg["load_path"], cfg.get("load_epoch", -1))

        if self.mesh is not None:
            from dexgangrasp_tpu.parallel.sharding import sharded_gan_step

            self._gan_step = sharded_gan_step(self.trainer, self.mesh)
        else:
            self._gan_step = lambda ts, b, k, is_train_gen=True: \
                self.trainer.gan_step(ts, _to_jax(b), k,
                                      is_train_gen=is_train_gen)

    def _resume(self, load_path: str, epoch: int) -> None:
        if epoch == -1:
            epoch = ckpt.latest_epoch(load_path, "gen") or \
                ckpt.latest_epoch(load_path, "eva")
        gen_path = ckpt.gen_ckpt_path(load_path, epoch)
        if os.path.isfile(gen_path):
            self.gan_ts, meta = ckpt.load_gan(gen_path, ts_template=self.gan_ts)
            if "scheduler_gen" in meta:
                self.sched_gen.load_state_dict(meta["scheduler_gen"])
            self.start_epoch = int(meta.get("epoch", epoch)) + 1
        eva_path = ckpt.eva_ckpt_path(load_path, epoch)
        if os.path.isfile(eva_path):
            self.eva_ts, meta = ckpt.load_evaluator(eva_path, as_state=True)
            if "scheduler" in meta:
                self.sched_eva.load_state_dict(meta["scheduler"])

    # ----------------------------------------------------------------- run

    def run(self, num_epochs: Optional[int] = None) -> Dict:
        cfg = self.cfg
        num_epochs = num_epochs or cfg["num_epochs"]
        gen_ds = (DexGeneratorDataSet(cfg["data_dir"], "train",
                                      group_joints=cfg["is_group_joints"])
                  if self.train_gen_flag else None)
        eva_ds = (DexEvaluatorDataSet(cfg["data_dir"], "train",
                                      group_joints=cfg["is_group_joints"])
                  if self.train_eva_flag else None)
        gen_eval_ds = (DexGeneratorDataSet(cfg["data_dir"], "eval",
                                           group_joints=cfg["is_group_joints"])
                       if self.train_gen_flag else None)
        eva_eval_ds = (DexEvaluatorDataSet(cfg["data_dir"], "eval",
                                           group_joints=cfg["is_group_joints"])
                       if self.train_eva_flag else None)

        key = jax.random.PRNGKey(cfg.get("seed", 0) + 1000)
        global_step = 0
        last_eval: Dict[str, float] = {}

        for epoch in range(self.start_epoch, num_epochs + 1):
            epoch_t0 = time.time()
            # ---- GAN epoch
            if gen_ds is not None:
                loader = BatchLoader(gen_ds, cfg["batch_size"],
                                     to_device=self.mesh is None)
                logs_acc = []
                t_data0 = time.time()
                for i, batch in enumerate(loader):
                    t_data = time.time() - t_data0
                    key, k = jax.random.split(key)
                    is_gen = (i % cfg["gen_train_freq"] == 0)
                    t0 = time.time()
                    self.gan_ts, logs = self._gan_step(
                        self.gan_ts, batch, k, is_train_gen=is_gen)
                    logs_acc.append(logs)
                    global_step += 1
                    if cfg["print_freq"] and i % cfg["print_freq"] == 0:
                        jax.block_until_ready(
                            jax.tree.leaves(self.gan_ts.gen_params)[0])
                        self.writer.print_current_train_loss(
                            epoch, i, logs, time.time() - t0, t_data)
                        self.writer.plot_train_loss(logs, global_step)
                    t_data0 = time.time()
                self.writer.plot_train_loss(_mean_logs(logs_acc),
                                            global_step)
            # ---- evaluator epoch
            if eva_ds is not None:
                loader = BatchLoader(eva_ds, cfg["batch_size"],
                                     to_device=True)
                logs_acc = []
                for i, batch in enumerate(loader):
                    key, k = jax.random.split(key)
                    self.eva_ts, logs = self.trainer.evaluator_step(
                        self.eva_ts, _to_jax(batch), k)
                    logs_acc.append(logs)
                self.writer.plot_train_loss(_mean_logs(logs_acc),
                                            global_step)

            # ---- periodic eval + checkpoint + schedules
            if epoch % cfg["save_freq"] == 0 or epoch == num_epochs:
                eval_logs = {}
                if gen_eval_ds is not None:
                    ev = []
                    for batch in BatchLoader(gen_eval_ds, cfg["batch_size"],
                                             shuffle=False):
                        key, k = jax.random.split(key)
                        ev.append(self.trainer.eval_gan_losses(
                            self.gan_ts, _to_jax(batch), k))
                    eval_logs.update(_mean_logs(ev))
                    lr = self.sched_gen.step(eval_logs.get("total_loss_gen",
                                                           np.inf))
                    set_lr(self.gan_ts.gen_opt, lr)
                    set_lr(self.gan_ts.disc_opt, lr)
                    ckpt.save_gan(cfg["save_dir"], epoch, self.gan_ts,
                                  scheduler_gen=self.sched_gen)
                if eva_eval_ds is not None:
                    ev = []
                    gts, preds = [], []
                    for batch in BatchLoader(eva_eval_ds, cfg["batch_size"],
                                             shuffle=False):
                        out = self.trainer.eval_evaluator(self.eva_ts,
                                                          _to_jax(batch))
                        gts.append(np.asarray(out.pop("gt_label")))
                        preds.append(np.asarray(out.pop("pred_label")))
                        ev.append(out)
                    eval_logs.update(_mean_logs(ev))
                    # label dumps like reference train.py:124-125
                    np.save(os.path.join(cfg["eval_dir"],
                                         f"{epoch}_gt_labels.npy"),
                            np.concatenate(gts))
                    np.save(os.path.join(cfg["eval_dir"],
                                         f"{epoch}_pred_labels.npy"),
                            np.concatenate(preds))
                    lr = self.sched_eva.step(eval_logs.get("total_loss_eva",
                                                           np.inf))
                    set_lr(self.eva_ts.opt, lr)
                    ckpt.save_evaluator(cfg["save_dir"], epoch, self.eva_ts,
                                        scheduler=self.sched_eva)
                self.writer.print_current_eval_loss(epoch, eval_logs)
                self.writer.plot_eval_loss(eval_logs, epoch)
                last_eval = eval_logs
            print(f"End of epoch {epoch} / {num_epochs}; "
                  f"took {time.time() - epoch_t0:.1f}s")
        self.writer.close()
        return last_eval


def _to_jax(batch: Dict) -> Dict:
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in batch.items()
            if not isinstance(v, list)}
