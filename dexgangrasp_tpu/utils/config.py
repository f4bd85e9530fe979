"""YAML config system, key-compatible with the reference.

``Config(path).parse()`` reproduces the reference behavior
(``DexGanGrasp/config/config.py:20-58``): on train runs it creates
``checkpoints/<ISO-datetime>_<name>/``, dumps the config there, and makes an
``eval/`` subdir; on eval/continue runs it reuses ``load_path``.

All reference keys (``config_dexgangrasp.yaml``) are accepted; defaults are
filled for any that are missing, so a reference YAML works verbatim.
"""
from __future__ import annotations

import datetime
import os
import shutil
from typing import Optional

import yaml

DEFAULTS = {
    "data_dir": "",
    "load_path": None,
    "gazebo_obj_path": "",
    "model": "dexgangrasp",
    "name": "dexgangrasp_tpu",
    "continue_train": False,
    "load_epoch": 1,
    "is_train": True,
    "is_group_joints": False,
    "ds_name": "train",
    "grasp_data_file_name": "grasp_data_all.h5",
    "gpu_ids": [0],
    "num_threads": 1,
    "train_ffhevaluator": False,
    "train_ffhgenerator": True,
    "eval_ffhevaluator": False,
    "eval_ffhgenerator": True,
    "print_freq": 100,
    "save_freq": 3,
    "to_tensorboard": True,
    "n_hand_joints": 12,
    "batch_size": 32,
    "beta1": 0.9,
    "bce_weight": 1.0,
    "init_gain": 0.02,
    "kl_coef": 0.005,
    "latentD": 5,
    "lr": 1e-4,
    "lr_policy": "plateau",
    "num_bps_per_object": 5,
    "num_epochs": 90,
    "patience_lr_policy_plateau": 3,
    "threshold_lr_policy_plateau": 0.01,
    "weight_decay": 5e-4,
    "weight_init_type": "xavier",
    "is_wgan": False,
    "gen_train_freq": 1,
    "lr_dis": 1e-4,
    "lr_gen": 1e-4,
    "basis_path": None,
    # reconstruction loss (the reference hardcodes 'transl_rot_6D_l2' at
    # dexgangrasp.py:120; exposed here): transl_rot_6d_l2 |
    # control_point_l1 | control_point_chamfer
    "recon_loss": "transl_rot_6d_l2",
}


class Config:
    def __init__(self, config_path: Optional[str] = None,
                 overrides: Optional[dict] = None):
        self.cfg = dict(DEFAULTS)
        self.abs_config_path = config_path
        if config_path is not None:
            with open(config_path) as f:
                loaded = yaml.safe_load(f) or {}
            self.cfg.update(loaded)
        if overrides:
            self.cfg.update(overrides)

    def parse(self, base_path: str = ".") -> dict:
        cfg = self.cfg
        if cfg["is_train"]:
            if cfg.get("continue_train") and cfg.get("load_path"):
                cfg["save_dir"] = cfg["load_path"]
            else:
                ckpts = os.path.join(base_path, "checkpoints")
                os.makedirs(ckpts, exist_ok=True)
                now = (datetime.datetime.now().replace(microsecond=0)
                       .isoformat().replace(":", "_"))
                cfg["save_dir"] = os.path.join(ckpts, f"{now}_{cfg['name']}")
                os.makedirs(cfg["save_dir"], exist_ok=True)
                with open(os.path.join(cfg["save_dir"], "config.yaml"),
                          "w") as f:
                    yaml.dump(cfg, f)
        else:
            cfg["save_dir"] = cfg.get("load_path") or base_path
        if self.abs_config_path:
            dst = os.path.join(cfg["save_dir"], "config_default.yaml")
            if not os.path.isfile(dst):
                os.makedirs(cfg["save_dir"], exist_ok=True)
                shutil.copy(self.abs_config_path, dst)
        cfg["eval_dir"] = os.path.join(cfg["save_dir"], "eval")
        os.makedirs(cfg["eval_dir"], exist_ok=True)
        return cfg


def train_config_from_cfg(cfg: dict):
    """Map a parsed YAML dict onto train.gan.TrainConfig."""
    from dexgangrasp_tpu.train.gan import TrainConfig

    return TrainConfig(
        latent_dim=cfg["latentD"],
        n_joints=cfg["n_hand_joints"],
        lr=cfg["lr"], lr_gen=cfg["lr_gen"], lr_dis=cfg["lr_dis"],
        beta1=cfg["beta1"], weight_decay=cfg["weight_decay"],
        bce_weight=cfg["bce_weight"], kl_coef=cfg["kl_coef"],
        is_wgan=cfg["is_wgan"], gen_train_freq=cfg["gen_train_freq"],
        init_type=cfg["weight_init_type"], init_gain=cfg["init_gain"],
        recon_loss=cfg.get("recon_loss", "transl_rot_6d_l2"),
        ms_coef=cfg.get("ms_coef", 0.0),
    )
