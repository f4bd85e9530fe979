"""URDF FK + mesh loading tests against the reference's robotiq assets."""
import os

import numpy as np
import pytest

from dexgangrasp_tpu.utils.urdf import URDF, load_stl_vertices

ROBOTIQ_URDF = ("/root/reference/meshes/robotiq_palm/"
                "robotiq-3f-gripper_articulated.urdf")

needs_assets = pytest.mark.skipif(not os.path.isfile(ROBOTIQ_URDF),
                                  reason="reference meshes not mounted")


@needs_assets
def test_parse_robotiq():
    u = URDF(ROBOTIQ_URDF)
    assert u.root == "palm"
    assert len(u.links) == 14
    movable = u.joint_names()
    assert "finger_1_joint_1" in movable
    assert "palm_finger_1_joint" in movable


@needs_assets
def test_fk_articulation():
    u = URDF(ROBOTIQ_URDF)
    fk_open = u.fk({k: 0.0 for k in u.joint_names()})
    fk_closed = u.fk({k: 0.6 for k in u.joint_names()})
    assert set(fk_open) == set(u.links)
    # finger tips move when joints close
    tip = "finger_1_link_3"
    d = np.linalg.norm(fk_open[tip][:3, 3] - fk_closed[tip][:3, 3])
    assert d > 0.01
    # palm (root) stays put
    np.testing.assert_allclose(fk_open["palm"], np.eye(4), atol=0)
    # transforms are rigid
    for T in fk_closed.values():
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)


@needs_assets
def test_hand_cloud_and_meshes():
    u = URDF(ROBOTIQ_URDF)
    cloud = u.hand_cloud({k: 0.2 for k in u.joint_names()})
    assert cloud.shape[0] > 1000  # meshes actually loaded
    assert np.abs(cloud).max() < 0.3  # meters scale, not mm
    stl = load_stl_vertices(
        "/root/reference/meshes/robotiq_palm/robotiq_3f_gripper_"
        "visualization/meshes/robotiq-3f-gripper_articulated/collision/"
        "link_0.STL")
    assert stl.shape[0] > 100 and stl.shape[1] == 3


@needs_assets
def test_show_grasp_with_urdf(tmp_path):
    from dexgangrasp_tpu.utils import visualization as viz

    rng = np.random.default_rng(0)
    points = rng.normal(size=(500, 3)) * 0.05
    p = viz.show_grasp_and_object(
        points, np.array([0.1, 0, 0]), np.eye(3),
        joint_conf=np.full(12, 0.3), urdf_path=ROBOTIQ_URDF,
        save_path=str(tmp_path / "urdf_grasp.png"))
    assert os.path.isfile(p)


def test_mimic_and_limits(tmp_path):
    urdf = tmp_path / "toy.urdf"
    urdf.write_text("""
<robot name="toy">
  <link name="base"/><link name="a"/><link name="b"/>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="a"/>
    <origin xyz="0 0 0.1"/><axis xyz="0 0 1"/>
    <limit lower="0" upper="0.5"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="a"/><child link="b"/>
    <origin xyz="0.2 0 0"/><axis xyz="0 0 1"/>
    <mimic joint="j1" multiplier="2.0" offset="0.1"/>
  </joint>
</robot>""")
    u = URDF(str(urdf))
    assert u.joint_names() == ["j1"]  # mimic excluded from movables
    fk = u.fk({"j1": 2.0})  # clamped to 0.5
    import numpy as np

    # j1 clamped at 0.5 → link a rotated by 0.5 about z at height 0.1
    np.testing.assert_allclose(fk["a"][:3, 3], [0, 0, 0.1], atol=1e-12)
    assert abs(fk["a"][0, 0] - np.cos(0.5)) < 1e-9
    # j2 mimics: 2*0.5+0.1 = 1.1 (no limit on j2)
    Rb = fk["a"][:3, :3].T @ fk["b"][:3, :3]
    assert abs(Rb[0, 0] - np.cos(1.1)) < 1e-9
