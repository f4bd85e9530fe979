"""The ``Grasps`` pytree — the framework's grasp-batch container.

Replaces the reference's string-keyed dicts ({'rot_matrix', 'transl',
'joint_conf', ...} passed around ``dexgangrasp.py`` / ``networks.py``) with a
typed, jit/vmap/shard-friendly structure.  Conversion helpers keep the
dict-based API of the reference available at the boundary.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Grasps:
    """A batch of grasps.

    Attributes:
      transl:     (N, 3) palm translation (object-centroid frame, meters)
      rot_matrix: (N, 3, 3) palm rotation
      joint_conf: (N, J) finger joint configuration (J = 12 robotiq / 15 hithand)
      score:      optional (N,) evaluator success probability
      z:          optional (N, D) latent that generated each grasp
    """

    transl: jax.Array
    rot_matrix: jax.Array
    joint_conf: jax.Array
    score: Optional[jax.Array] = None
    z: Optional[jax.Array] = None

    def __len__(self):
        return self.transl.shape[0]

    @property
    def n(self):
        return self.transl.shape[0]

    def take(self, idx) -> "Grasps":
        """Gather a subset/reordering by index array."""
        f = lambda x: None if x is None else jnp.take(x, idx, axis=0)
        return Grasps(
            transl=f(self.transl),
            rot_matrix=f(self.rot_matrix),
            joint_conf=f(self.joint_conf),
            score=f(self.score),
            z=f(self.z),
        )

    def to_dict(self, numpy: bool = False) -> dict:
        """Reference-compatible dict view (keys as in ``dexgangrasp.py``)."""
        out = {
            "rot_matrix": self.rot_matrix,
            "transl": self.transl,
            "joint_conf": self.joint_conf,
        }
        if self.score is not None:
            out["score"] = self.score
        if self.z is not None:
            out["z"] = self.z
        if numpy:
            out = {k: np.asarray(v) for k, v in out.items()}
        return out

    @staticmethod
    def from_dict(d: dict) -> "Grasps":
        return Grasps(
            transl=jnp.asarray(d["transl"]),
            rot_matrix=jnp.asarray(d["rot_matrix"]),
            joint_conf=jnp.asarray(d["joint_conf"]),
            score=jnp.asarray(d["score"]) if "score" in d else None,
            z=jnp.asarray(d["z"]) if "z" in d else None,
        )
