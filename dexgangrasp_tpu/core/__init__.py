from dexgangrasp_tpu.core.rotations import (
    normalize_vector,
    rot_matrix_from_ortho6d,
    ortho6d_from_rot_matrix,
    geodesic_distance,
    quat_wxyz_to_mat,
    quat_xyzw_to_mat,
    euler_to_mat,
    mat_to_euler,
)
from dexgangrasp_tpu.core.transforms import (
    hom_from_transl_rot,
    hom_from_pos_quat,
    transform_points,
    translate_along_axis,
)
from dexgangrasp_tpu.core.joints import (
    reduce_joint_conf,
    full_joint_conf_from_partial,
    HAND_CFG,
    ROBOTIQ_CFG,
    hand_cfg_map,
)
from dexgangrasp_tpu.core.grasp import Grasps
from dexgangrasp_tpu.core.perturb import hard_negative_from_positive
