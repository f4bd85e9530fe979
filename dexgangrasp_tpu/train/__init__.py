from dexgangrasp_tpu.train.losses import (
    bce,
    transl_rot_6d_l2_loss,
    kl_divergence,
    accuracy_evaluator,
    control_point_l1_loss,
)
from dexgangrasp_tpu.train.gan import GanTrainer, TrainConfig
from dexgangrasp_tpu.train.schedule import PlateauScheduler, EarlyStopping
