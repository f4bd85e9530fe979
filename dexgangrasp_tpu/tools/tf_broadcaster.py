"""TF broadcaster node — counterpart of ``scripts/visualize_tf.py``.

Broadcasts base→camera (calibrated extrinsic), the robot pose, and the
latest inferred grasp pose (read from ``base2flange_inferred.npy``) at a
fixed rate so RViz can display the scene.  ROS imports are lazy; the frame
math is importable/testable standalone.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

# reference visualize_tf.py:17 hardcodes the rig extrinsic; ours is a
# constructor argument with that shape as the documented default layout
DEFAULT_RATE_HZ = 100.0


def transform_to_pos_quat(T: np.ndarray):
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(T[:3, :3]).as_quat()  # xyzw
    return T[:3, 3], q


class TFBroadcaster:
    def __init__(self, base_T_cam: np.ndarray,
                 inferred_pose_path: str = "./base2flange_inferred.npy",
                 rate_hz: float = DEFAULT_RATE_HZ):
        self.base_T_cam = base_T_cam
        self.inferred_pose_path = inferred_pose_path
        self.rate_hz = rate_hz

    def frames(self):
        """Yield (parent, child, T) triples for one broadcast cycle."""
        out = [("base", "camera", self.base_T_cam)]
        if os.path.isfile(self.inferred_pose_path):
            T = np.load(self.inferred_pose_path)
            out.append(("base", "inferred_grasp", T))
        return out

    def run_ros(self) -> None:  # pragma: no cover — hardware only
        import rospy
        import tf2_ros
        from geometry_msgs.msg import TransformStamped

        rospy.init_node("dexgg_tf_broadcaster")
        br = tf2_ros.TransformBroadcaster()
        rate = rospy.Rate(self.rate_hz)
        while not rospy.is_shutdown():
            now = rospy.Time.now()
            for parent, child, T in self.frames():
                pos, quat = transform_to_pos_quat(T)
                msg = TransformStamped()
                msg.header.stamp = now
                msg.header.frame_id = parent
                msg.child_frame_id = child
                (msg.transform.translation.x, msg.transform.translation.y,
                 msg.transform.translation.z) = pos
                (msg.transform.rotation.x, msg.transform.rotation.y,
                 msg.transform.rotation.z, msg.transform.rotation.w) = quat
                br.sendTransform(msg)
            rate.sleep()
