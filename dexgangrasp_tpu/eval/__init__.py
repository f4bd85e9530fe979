from dexgangrasp_tpu.eval.magd import (
    magd_for_grasp_distribution,
    pairwise_transl_sq,
    pairwise_joint_sq,
    pairwise_rot_geodesic,
)
from dexgangrasp_tpu.eval.eval_batch import load_eval_batch
