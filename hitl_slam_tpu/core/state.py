"""The MapState pytree and the human-constraint data model.

TPU-first redesign of the reference's mutable session state
(HitLSLAM.h:57-92): dense, statically shaped arrays with validity masks so the
whole repair pipeline can be traced once and re-run with zero recompiles.

  - poses[P, 3]            (x, y, theta) per pose
  - covariances[P, 3, 3]   per-pose covariance blocks
  - points[P, N, 2]        robot-frame lidar points, padded to N_max
  - normals[P, N, 2]       per-point normals
  - point_mask[P, N]       validity of padded entries
  - ConstraintTable        struct-of-arrays encoding of HumanConstraint
                           (reference: human_constraints.h:29-41) with a fixed
                           capacity and an active count, so the factor set can
                           grow across corrections without changing shapes.

CorrectionType values double as the GUI modifier bitmask exactly as in the
reference (human_constraints.h:8-16): Alt=1, Ctrl=2, Alt+Ctrl=3, Shift=4,
Shift+Alt=5, Ctrl+Shift=6.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class CorrectionType(enum.IntEnum):
    UNKNOWN = 0
    POINT = 1          # ALT          (unsupported in reference too)
    LINE_SEGMENT = 2   # CTRL         ("colocation")
    CORNER = 3         # ALT + CTRL   (unsupported in reference too)
    COLINEAR = 4       # SHIFT
    PERPENDICULAR = 5  # SHIFT + ALT
    PARALLEL = 6       # CTRL + SHIFT


CORRECTION_TYPE_NAMES = {
    CorrectionType.UNKNOWN: "Unknown",
    CorrectionType.POINT: "Point",
    CorrectionType.LINE_SEGMENT: "LineSegment",
    CorrectionType.CORNER: "Corner",
    CorrectionType.COLINEAR: "Colinear",
    CorrectionType.PERPENDICULAR: "Perpendicular",
    CorrectionType.PARALLEL: "Parallel",
}

# Residual counts per constraint type in the joint solve
# (reference: JointOptimization.cpp:969-1054).
RESIDUALS_PER_TYPE = {
    CorrectionType.LINE_SEGMENT: 3,
    CorrectionType.COLINEAR: 2,
    CorrectionType.PERPENDICULAR: 1,
    CorrectionType.PARALLEL: 1,
}


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ConstraintTable:
    """Struct-of-arrays HumanConstraint store with static capacity.

    Fields mirror human_constraints.h:29-41; `active` marks live rows. Rows are
    appended by the session orchestrator; `count` is host-side metadata.
    """

    ctype: Array        # [C] int32, CorrectionType value
    constrained: Array  # [C] int32 pose id
    anchor: Array       # [C] int32 pose id
    delta_parallel: Array       # [C] f32
    delta_perpendicular: Array  # [C] f32
    delta_angle: Array          # [C] f32
    penalty_dir: Array          # [C] f32 (relative penalty direction)
    active: Array       # [C] bool

    @staticmethod
    def empty(capacity: int, dtype=jnp.float32) -> "ConstraintTable":
        zf = jnp.zeros((capacity,), dtype)
        zi = jnp.zeros((capacity,), jnp.int32)
        return ConstraintTable(
            ctype=zi, constrained=zi, anchor=zi,
            delta_parallel=zf, delta_perpendicular=zf, delta_angle=zf,
            penalty_dir=zf, active=jnp.zeros((capacity,), bool),
        )

    @property
    def capacity(self) -> int:
        return self.ctype.shape[0]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MapState:
    """The full repairable-map state as a pytree of dense device arrays."""

    poses: Array          # [P, 3]
    covariances: Array    # [P, 3, 3]
    points: Array         # [P, N, 2] robot frame
    normals: Array        # [P, N, 2] robot frame
    point_mask: Array     # [P, N] bool
    odometry: Array       # [P, 3] raw odometry poses (kept for parity/export)
    constraints: ConstraintTable

    @property
    def num_poses(self) -> int:
        return self.poses.shape[0]

    @property
    def max_points(self) -> int:
        return self.points.shape[1]

    def world_points(self) -> Array:
        """[P, N, 2] points transformed into the world frame (lazy — computed
        on demand to keep HBM traffic down rather than stored like the
        reference's WORLD_FRAME_point_clouds_)."""
        from ..ops import geometry

        return geometry.pose_to_world(self.poses[:, None, :], self.points)


@dataclass
class SingleInput:
    """One logged human correction (reference: human_constraints.h:43-47)."""

    correction_type: CorrectionType
    undone: int
    points: np.ndarray  # [K, 2] clicked points (world frame)


def make_map_state(
    poses: np.ndarray,
    covariances: np.ndarray,
    point_clouds: list[np.ndarray],
    normal_clouds: list[np.ndarray],
    odometry: np.ndarray | None = None,
    constraint_capacity: int = 8192,
    max_points: int | None = None,
    pad_multiple: int = 128,
    dtype=jnp.float32,
) -> MapState:
    """Pack ragged per-pose clouds into a padded, masked MapState.

    N_max is rounded up to `pad_multiple` to keep the last dims friendly to
    the VPU/MXU lane width (128).
    """
    num_poses = len(point_clouds)
    assert poses.shape == (num_poses, 3)
    if max_points is None:
        max_points = max((len(pc) for pc in point_clouds), default=1)
    max_points = max(1, -(-max_points // pad_multiple) * pad_multiple)

    pts = np.zeros((num_poses, max_points, 2), np.float32)
    nrm = np.zeros((num_poses, max_points, 2), np.float32)
    msk = np.zeros((num_poses, max_points), bool)
    for i, (pc, nc) in enumerate(zip(point_clouds, normal_clouds)):
        k = min(len(pc), max_points)
        pts[i, :k] = pc[:k]
        nrm[i, :k] = nc[:k]
        msk[i, :k] = True

    if odometry is None:
        odometry = poses.copy()

    return MapState(
        poses=jnp.asarray(poses, dtype),
        covariances=jnp.asarray(covariances, dtype),
        points=jnp.asarray(pts, dtype),
        normals=jnp.asarray(nrm, dtype),
        point_mask=jnp.asarray(msk),
        odometry=jnp.asarray(odometry, dtype),
        constraints=ConstraintTable.empty(constraint_capacity, dtype),
    )
