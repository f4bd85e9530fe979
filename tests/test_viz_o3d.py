"""Tests for the optional open3d viewer backend (utils/viz_o3d.py).

open3d is not installed in CI; a fake module is injected to verify the
backend builds the right geometry set, applies saved viewpoints, and that
the public visualization API routes between backends correctly."""
import os
import sys
import types

import numpy as np
import pytest


class _FakeVec:
    def __init__(self, arr):
        self.arr = np.asarray(arr)


class _FakePcd:
    def __init__(self):
        self.points = None
        self.color = None

    def paint_uniform_color(self, c):
        self.color = c


class _FakeMesh:
    def __init__(self, size):
        self.size = size
        self.T = np.eye(4)

    def transform(self, T):
        self.T = np.asarray(T)


class _FakeViewControl:
    def __init__(self):
        self.applied = None

    def convert_from_pinhole_camera_parameters(self, p):
        self.applied = p

    def convert_to_pinhole_camera_parameters(self):
        return {"fake": "params"}


class _FakeVis:
    created = []

    def __init__(self):
        self.geometries = []
        self.window = None
        self.ran = False
        self.destroyed = False
        self._vc = _FakeViewControl()
        _FakeVis.created.append(self)

    def create_window(self, window_name="w"):
        self.window = window_name

    def add_geometry(self, g):
        self.geometries.append(g)

    def get_view_control(self):
        return self._vc

    def get_render_option(self):
        return types.SimpleNamespace(load_from_json=lambda p: None)

    def run(self):
        self.ran = True

    def destroy_window(self):
        self.destroyed = True


def _fake_o3d():
    o3d = types.ModuleType("open3d")
    o3d.geometry = types.SimpleNamespace(
        PointCloud=_FakePcd,
        TriangleMesh=types.SimpleNamespace(
            create_coordinate_frame=lambda size: _FakeMesh(size)),
    )
    o3d.utility = types.SimpleNamespace(Vector3dVector=_FakeVec)
    o3d.visualization = types.SimpleNamespace(Visualizer=_FakeVis)
    o3d.io = types.SimpleNamespace(
        read_pinhole_camera_parameters=lambda p: {"from": p},
        write_pinhole_camera_parameters=lambda p, params: None,
    )
    return o3d


@pytest.fixture
def fake_o3d(monkeypatch):
    o3d = _fake_o3d()
    monkeypatch.setitem(sys.modules, "open3d", o3d)
    _FakeVis.created.clear()
    return o3d


def _grasps(n=5):
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(0)
    return {"transl": rng.normal(size=(n, 3)) * 0.1,
            "rot_matrix": Rotation.random(n, rng=rng).as_matrix()}


def test_available_flag(fake_o3d):
    from dexgangrasp_tpu.utils.viz_o3d import o3d_available

    assert o3d_available()


def test_distribution_viewer_builds_geometries(fake_o3d, tmp_path):
    from dexgangrasp_tpu.utils.viz_o3d import (
        show_generated_grasp_distribution_o3d,
    )

    vp = tmp_path / "view_point.json"
    vp.write_text("{}")
    cloud = np.random.default_rng(1).normal(size=(100, 3)) * 0.05
    vis = show_generated_grasp_distribution_o3d(
        cloud, _grasps(5), view_point_path=str(vp))
    # 1 cloud + 5 frames, saved viewpoint applied, window ran + closed
    assert len(vis.geometries) == 6
    assert isinstance(vis.geometries[0], _FakePcd)
    assert vis.geometries[1].T.shape == (4, 4)
    assert vis._vc.applied == {"from": str(vp)}
    assert vis.ran and vis.destroyed


def test_grasp_and_object_viewer(fake_o3d):
    from dexgangrasp_tpu.utils.viz_o3d import show_grasp_and_object_o3d

    cloud = np.zeros((10, 3))
    vis = show_grasp_and_object_o3d(cloud, np.zeros(3), np.eye(3))
    assert len(vis.geometries) == 2  # cloud + 1 frame (no urdf given)


def test_auto_backend_routes_to_o3d(fake_o3d, monkeypatch):
    from dexgangrasp_tpu.utils import visualization as viz

    monkeypatch.setenv("DISPLAY", ":0")
    out = viz.show_generated_grasp_distribution(
        np.zeros((10, 3)), _grasps(3), backend="auto")
    assert isinstance(out, _FakeVis)


def test_auto_backend_falls_back_headless(fake_o3d, monkeypatch, tmp_path):
    """save_path requested → matplotlib even when o3d is importable."""
    from dexgangrasp_tpu.utils import visualization as viz

    p = viz.show_generated_grasp_distribution(
        np.zeros((10, 3)), _grasps(3),
        save_path=str(tmp_path / "d.png"), backend="auto")
    assert p is not None and os.path.isfile(p)


def test_missing_o3d_raises(monkeypatch):
    import builtins

    real_import = builtins.__import__

    def deny(name, *a, **k):
        if name == "open3d":
            raise ImportError("nope")
        return real_import(name, *a, **k)

    monkeypatch.delitem(sys.modules, "open3d", raising=False)
    monkeypatch.setattr(builtins, "__import__", deny)
    from dexgangrasp_tpu.utils.viz_o3d import (
        o3d_available,
        show_generated_grasp_distribution_o3d,
    )

    assert not o3d_available()
    with pytest.raises(RuntimeError):
        show_generated_grasp_distribution_o3d(np.zeros((4, 3)), _grasps(2))
