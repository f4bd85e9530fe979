"""Robot pick-and-place control node — counterpart of
``scripts/pick_place.py``.

State machine: home → intermediate → pick (close gripper) → retreat →
place → open — driven by goals received on the ``goal_pick_pose`` channel,
with the reference's did-it-move sanity check (``pick_place.py:93-104``).

The arm/gripper are injected interfaces; a ROS/iiwa adapter is provided
behind optional imports (the framework core never imports rospy).
"""
from __future__ import annotations

import ast
import time
from typing import Dict, Protocol

import numpy as np


class Arm(Protocol):
    def move_to(self, pose: Dict) -> None: ...
    def current_pose(self) -> Dict: ...


class Gripper(Protocol):
    def open(self) -> None: ...
    def close(self) -> None: ...


def pose_distance(p1: Dict, p2: Dict) -> float:
    a = np.array([p1["position"][k] for k in "xyz"])
    b = np.array([p2["position"][k] for k in "xyz"])
    return float(np.linalg.norm(a - b))


class RobotControl:
    """Drives one pick-place cycle from a goals dict
    ({'0': {'inter': pose, 'pick': pose}, ...})."""

    def __init__(self, arm: Arm, gripper: Gripper, home_pose: Dict,
                 place_pose: Dict, move_tolerance: float = 0.02,
                 settle_s: float = 0.5):
        self.arm = arm
        self.gripper = gripper
        self.home_pose = home_pose
        self.place_pose = place_pose
        self.move_tolerance = move_tolerance
        self.settle_s = settle_s

    def _move_checked(self, pose: Dict) -> bool:
        """Move and verify the arm actually reached the target (reference
        sanity check pick_place.py:93-104)."""
        self.arm.move_to(pose)
        time.sleep(self.settle_s)
        reached = pose_distance(self.arm.current_pose(), pose)
        if reached > self.move_tolerance:
            print(f"[pick_place] arm did not reach target "
                  f"(err {reached:.3f} m > {self.move_tolerance} m)")
            return False
        return True

    def execute(self, goals: Dict, grasp_id: str = "0") -> bool:
        goal = goals[grasp_id]
        self.gripper.open()
        if not self._move_checked(self.home_pose):
            return False
        if not self._move_checked(goal["inter"]):
            return False
        if not self._move_checked(goal["pick"]):
            return False
        self.gripper.close()
        if not self._move_checked(goal["inter"]):
            return False
        if not self._move_checked(self.place_pose):
            return False
        self.gripper.open()
        self._move_checked(self.home_pose)
        return True

    def on_goal_message(self, msg: str, grasp_id: str = "0") -> bool:
        """Parse the published string dict (reference transport) and run."""
        goals = ast.literal_eval(msg)
        return self.execute(goals, grasp_id)


# ----------------------------------------------------------- ROS adapters


class IiwaArm:
    """KUKA iiwa CartesianPose adapter (reference pick_place.py:18-26)."""

    def __init__(self, topic: str = "/iiwa/command/CartesianPose"):
        import rospy
        from geometry_msgs.msg import PoseStamped

        self._rospy = rospy
        self._PoseStamped = PoseStamped
        self.pub = rospy.Publisher(topic, PoseStamped, queue_size=10)
        self._state_topic = "/iiwa/state/CartesianPose"

    def move_to(self, pose: Dict) -> None:
        msg = self._PoseStamped()
        msg.header.frame_id = "iiwa_link_0"
        p, o = pose["position"], pose["orientation"]
        msg.pose.position.x, msg.pose.position.y, msg.pose.position.z = \
            p["x"], p["y"], p["z"]
        (msg.pose.orientation.x, msg.pose.orientation.y,
         msg.pose.orientation.z, msg.pose.orientation.w) = \
            o["x"], o["y"], o["z"], o["w"]
        self.pub.publish(msg)

    def current_pose(self) -> Dict:
        from iiwa_msgs.msg import CartesianPose

        msg = self._rospy.wait_for_message(self._state_topic, CartesianPose)
        pose = msg.poseStamped.pose
        return {"position": {"x": pose.position.x, "y": pose.position.y,
                             "z": pose.position.z},
                "orientation": {"x": pose.orientation.x,
                                "y": pose.orientation.y,
                                "z": pose.orientation.z,
                                "w": pose.orientation.w}}


class Robotiq3fGripper:
    """Robotiq 3F service adapter (reference pick_place.py services)."""

    def __init__(self):
        import rospy
        from robotiq_3f_srvs.srv import Move

        self._open = rospy.ServiceProxy("/robotiq_3f/open_hand", Move)
        self._close = rospy.ServiceProxy("/robotiq_3f/close_hand", Move)

    def open(self) -> None:
        self._open()

    def close(self) -> None:
        self._close()
