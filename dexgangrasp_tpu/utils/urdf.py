"""Minimal URDF parsing + forward kinematics for hand visualization.

The reference renders the hand on the object through pyrender+urdfpy
(``visualization.py:544-719``, robotiq-3f URDF at
``meshes/robotiq_palm/robotiq-3f-gripper_articulated.urdf``).  Neither
library is available headless, so this module implements the needed
subset natively:

- URDF XML → link/joint tree (revolute/continuous/prismatic/fixed,
  origin xyz/rpy, axis, mimic joints),
- forward kinematics for a {joint_name: value} configuration
  (``core.joints.hand_cfg_map`` produces it, reference ``utils.py:188``),
- binary/ascii STL loading for link meshes (subsampled for matplotlib).

Pure numpy; used by ``utils.visualization.show_grasp_and_object`` when a
URDF path is supplied.
"""
from __future__ import annotations

import dataclasses
import os
import struct
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np


def _rpy_to_mat(r, p, y):
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), \
        np.cos(y), np.sin(y)
    return np.array([
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
        [-sp, cp * sr, cp * cr]])


def _origin_to_hom(el) -> np.ndarray:
    T = np.eye(4)
    if el is None:
        return T
    xyz = [float(v) for v in (el.get("xyz") or "0 0 0").split()]
    rpy = [float(v) for v in (el.get("rpy") or "0 0 0").split()]
    T[:3, :3] = _rpy_to_mat(*rpy)
    T[:3, 3] = xyz
    return T


def _axis_angle_to_mat(axis: np.ndarray, angle: float) -> np.ndarray:
    axis = axis / max(np.linalg.norm(axis), 1e-12)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


@dataclasses.dataclass
class Joint:
    name: str
    jtype: str
    parent: str
    child: str
    origin: np.ndarray
    axis: np.ndarray
    mimic_joint: Optional[str] = None
    mimic_multiplier: float = 1.0
    mimic_offset: float = 0.0
    lower: float = -np.inf
    upper: float = np.inf


@dataclasses.dataclass
class Link:
    name: str
    visual_origin: np.ndarray
    mesh_file: Optional[str]
    mesh_scale: np.ndarray


class URDF:
    def __init__(self, path: str):
        self.path = path
        self.dir = os.path.dirname(os.path.abspath(path))
        root = ET.parse(path).getroot()
        self.name = root.get("name", "robot")
        self.links: Dict[str, Link] = {}
        self.joints: Dict[str, Joint] = {}
        for link_el in root.findall("link"):
            visual = link_el.find("visual")
            origin = _origin_to_hom(visual.find("origin")
                                    if visual is not None else None)
            mesh_file, scale = None, np.ones(3)
            if visual is not None:
                mesh = visual.find("geometry/mesh")
                if mesh is not None:
                    mesh_file = mesh.get("filename")
                    if mesh.get("scale"):
                        scale = np.array([float(v)
                                          for v in mesh.get("scale").split()])
            self.links[link_el.get("name")] = Link(
                link_el.get("name"), origin, mesh_file, scale)
        for j_el in root.findall("joint"):
            axis_el = j_el.find("axis")
            axis = (np.array([float(v) for v in axis_el.get("xyz").split()])
                    if axis_el is not None else np.array([1.0, 0, 0]))
            mimic = j_el.find("mimic")
            limit = j_el.find("limit")
            joint = Joint(
                name=j_el.get("name"),
                jtype=j_el.get("type"),
                parent=j_el.find("parent").get("link"),
                child=j_el.find("child").get("link"),
                origin=_origin_to_hom(j_el.find("origin")),
                axis=axis,
                mimic_joint=mimic.get("joint") if mimic is not None else None,
                mimic_multiplier=float(mimic.get("multiplier", "1"))
                if mimic is not None else 1.0,
                mimic_offset=float(mimic.get("offset", "0"))
                if mimic is not None else 0.0,
                lower=float(limit.get("lower", "-inf"))
                if limit is not None else -np.inf,
                upper=float(limit.get("upper", "inf"))
                if limit is not None else np.inf,
            )
            self.joints[joint.name] = joint
        children = {j.child for j in self.joints.values()}
        roots = [l for l in self.links if l not in children]
        self.root = roots[0] if roots else next(iter(self.links))

    def joint_names(self, movable_only: bool = True) -> List[str]:
        return [n for n, j in self.joints.items()
                if not movable_only or (j.jtype != "fixed"
                                        and j.mimic_joint is None)]

    def fk(self, cfg: Optional[Dict[str, float]] = None
           ) -> Dict[str, np.ndarray]:
        """{joint: value} → {link: 4×4 world transform} (root at origin).

        Mimic joints follow value = multiplier*source + offset; values are
        clamped to joint limits like urdfpy does.
        """
        cfg = dict(cfg or {})
        # clamp actuated values first, then resolve mimics from the
        # physically realized (clamped) source values
        for name, j in self.joints.items():
            if name in cfg and j.mimic_joint is None:
                cfg[name] = float(np.clip(cfg[name], j.lower, j.upper))
        for name, j in self.joints.items():
            if j.mimic_joint is not None:
                src = cfg.get(j.mimic_joint, 0.0)
                cfg[name] = j.mimic_multiplier * src + j.mimic_offset
        out = {self.root: np.eye(4)}
        pending = [j for j in self.joints.values()]
        while pending:
            progressed = False
            rest = []
            for j in pending:
                if j.parent not in out:
                    rest.append(j)
                    continue
                v = np.clip(cfg.get(j.name, 0.0), j.lower, j.upper)
                motion = np.eye(4)
                if j.jtype in ("revolute", "continuous"):
                    motion[:3, :3] = _axis_angle_to_mat(j.axis, v)
                elif j.jtype == "prismatic":
                    motion[:3, 3] = j.axis * v
                out[j.child] = out[j.parent] @ j.origin @ motion
                progressed = True
            pending = rest
            if not progressed:
                break
        return out

    def link_points(self, link: str, max_points: int = 300
                    ) -> Optional[np.ndarray]:
        """Subsampled mesh vertices of a link in its visual frame."""
        l = self.links[link]
        if l.mesh_file is None:
            return None
        mesh_path = l.mesh_file
        for prefix in ("package://", "file://"):
            if mesh_path.startswith(prefix):
                mesh_path = mesh_path[len(prefix):]
        if not os.path.isabs(mesh_path):
            cand = os.path.join(self.dir, mesh_path)
            mesh_path = cand
        candidates = [mesh_path]
        if mesh_path.lower().endswith(".dae"):
            # prefer the sibling collision STL when the visual mesh is
            # COLLADA (same geometry, simpler format)
            stl = (mesh_path.replace("/visual/", "/collision/")
                   .replace(".dae", ".STL"))
            candidates = [stl, mesh_path]
        verts = None
        for cand in candidates:
            if not os.path.isfile(cand):
                continue
            try:
                if cand.lower().endswith(".dae"):
                    verts = load_dae_vertices(cand)
                else:
                    verts = load_stl_vertices(cand)
                break
            except Exception:
                continue
        if verts is None or verts.shape[0] == 0:
            return None
        verts = verts * l.mesh_scale
        if verts.shape[0] > max_points:
            idx = np.linspace(0, verts.shape[0] - 1, max_points).astype(int)
            verts = verts[idx]
        return (l.visual_origin[:3, :3] @ verts.T).T + l.visual_origin[:3, 3]

    def hand_cloud(self, cfg: Optional[Dict[str, float]] = None,
                   max_points_per_link: int = 200) -> np.ndarray:
        """FK'd point cloud over all link meshes (for viz / collision
        proxies).  Links without loadable meshes contribute their frame
        origin."""
        fk = self.fk(cfg)
        pts = []
        for name, T in fk.items():
            lp = self.link_points(name, max_points_per_link)
            if lp is None:
                lp = np.zeros((1, 3))
            pts.append((T[:3, :3] @ lp.T).T + T[:3, 3])
        return np.concatenate(pts, axis=0)


def load_dae_vertices(path: str) -> np.ndarray:
    """COLLADA (.dae) → (N, 3) vertices: every stride-3 <float_array> under
    a mesh source (enough for point-cloud rendering; ignores transforms
    inside the dae, which the robotiq assets don't use)."""
    root = ET.parse(path).getroot()
    out = []
    for fa in root.iter("{http://www.collada.org/2005/11/COLLADASchema}"
                        "float_array"):
        vals = np.array(fa.text.split(), np.float32)
        if vals.size % 3 == 0 and vals.size >= 9:
            out.append(vals.reshape(-1, 3))
    if not out:
        return np.zeros((0, 3), np.float32)
    return np.concatenate(out, axis=0)


def load_stl_vertices(path: str) -> np.ndarray:
    """Binary or ascii STL → unique-ish (N, 3) vertex array."""
    with open(path, "rb") as f:
        head = f.read(5)
        f.seek(0)
        data = f.read()
    if head[:5] == b"solid" and b"facet" in data[:500]:
        # ascii
        verts = []
        for line in data.decode("ascii", "replace").splitlines():
            line = line.strip()
            if line.startswith("vertex"):
                verts.append([float(v) for v in line.split()[1:4]])
        return np.asarray(verts, np.float32)
    n_tri = struct.unpack("<I", data[80:84])[0]
    arr = np.frombuffer(data, dtype=np.uint8, count=n_tri * 50, offset=84)
    arr = arr.reshape(n_tri, 50)
    tri = arr[:, 12:48].copy().view(np.float32).reshape(n_tri, 3, 3)
    return tri.reshape(-1, 3)
